// PJRT loader for the exported TransformerCVN StableHLO graphs.
//
// This is the C++ inference hook replacing the reference's
// TorchScript-in-LArSoft flow (CreateCompiled.ipynb cell 14 -> ART module):
// it loads a serialized `*.stablehlo` artifact produced by
// dune_transformercvn_tpu/export.py and executes it through the PJRT C API,
// which is the stable ABI every XLA backend (TPU libtpu, CPU, GPU) exposes.
//
// Build (CPU plugin example):
//   g++ -std=c++17 -O2 pjrt_loader.cc -ldl -o pjrt_loader
// Run:
//   ./pjrt_loader /path/to/pjrt_c_api_cpu_plugin.so model_pid.stablehlo
//
// The PJRT C API header (pjrt_c_api.h) ships with jaxlib:
//   python -c "import jaxlib, os; print(os.path.dirname(jaxlib.__file__))"
// contains include/xla/pjrt/c/pjrt_c_api.h — add that directory with -I.
//
// Calling convention (see <prefix>_export_meta.json): one f32 input
// [1 + max_prongs, C, H, W] of raw pixel counts (event map first, prong maps
// padded to max_prongs) plus one i32 scalar with the real prong count; read
// the first num_prongs rows of the prong outputs.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <dlfcn.h>
#include <fstream>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

#define CHECK_PJRT(api, err)                                              \
  do {                                                                    \
    if (err != nullptr) {                                                 \
      PJRT_Error_Message_Args msg_args;                                   \
      msg_args.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;         \
      msg_args.extension_start = nullptr;                                 \
      msg_args.error = err;                                               \
      api->PJRT_Error_Message(&msg_args);                                 \
      std::fprintf(stderr, "PJRT error: %.*s\n",                          \
                   static_cast<int>(msg_args.message_size),               \
                   msg_args.message);                                     \
      return 1;                                                           \
    }                                                                     \
  } while (0)

static std::string ReadFile(const char* path) {
  std::ifstream file(path, std::ios::binary);
  return std::string(std::istreambuf_iterator<char>(file), {});
}

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s <pjrt_plugin.so> <model.stablehlo>\n",
                 argv[0]);
    return 2;
  }

  // ---- load the backend plugin (libtpu / CPU / GPU) -----------------------
  void* plugin = dlopen(argv[1], RTLD_NOW | RTLD_LOCAL);
  if (plugin == nullptr) {
    std::fprintf(stderr, "dlopen failed: %s\n", dlerror());
    return 1;
  }
  auto get_api = reinterpret_cast<const PJRT_Api* (*)()>(
      dlsym(plugin, "GetPjrtApi"));
  if (get_api == nullptr) {
    std::fprintf(stderr, "plugin has no GetPjrtApi symbol\n");
    return 1;
  }
  const PJRT_Api* api = get_api();

  // ---- create the client --------------------------------------------------
  PJRT_Client_Create_Args create_args;
  std::memset(&create_args, 0, sizeof(create_args));
  create_args.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  CHECK_PJRT(api, api->PJRT_Client_Create(&create_args));
  PJRT_Client* client = create_args.client;

  // ---- compile the serialized StableHLO artifact --------------------------
  // jax.export artifacts are serialized PortableArtifacts; PJRT accepts them
  // through the "mlir" program format.
  const std::string artifact = ReadFile(argv[2]);
  PJRT_Program program;
  std::memset(&program, 0, sizeof(program));
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = const_cast<char*>(artifact.data());
  program.code_size = artifact.size();
  static const char kFormat[] = "mlir";
  program.format = kFormat;
  program.format_size = sizeof(kFormat) - 1;

  PJRT_Client_Compile_Args compile_args;
  std::memset(&compile_args, 0, sizeof(compile_args));
  compile_args.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  compile_args.client = client;
  compile_args.program = &program;
  // Default (empty) CompileOptions proto: single replica, single partition.
  compile_args.compile_options = nullptr;
  compile_args.compile_options_size = 0;
  CHECK_PJRT(api, api->PJRT_Client_Compile(&compile_args));
  PJRT_LoadedExecutable* executable = compile_args.executable;

  std::printf("compiled %s through %s\n", argv[2], argv[1]);

  // ---- host buffers -------------------------------------------------------
  // Shapes come from <prefix>_export_meta.json; hard-coded here for the
  // production geometry: [21, 3, 400, 280] f32 + scalar i32.
  const int64_t pixel_dims[4] = {21, 3, 400, 280};
  std::vector<float> pixels(21 * 3 * 400 * 280, 0.0f);
  int32_t num_prongs = 3;

  auto to_device = [&](const void* data, PJRT_Buffer_Type type,
                       const int64_t* dims, size_t num_dims,
                       PJRT_Buffer** out) -> const PJRT_Error* {
    PJRT_Client_DefaultDeviceAssignment_Args dev_args;  // use device 0
    (void)dev_args;
    PJRT_Client_Devices_Args devices_args;
    std::memset(&devices_args, 0, sizeof(devices_args));
    devices_args.struct_size = PJRT_Client_Devices_Args_STRUCT_SIZE;
    devices_args.client = client;
    if (auto* e = api->PJRT_Client_Devices(&devices_args)) return e;

    PJRT_Client_BufferFromHostBuffer_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    args.client = client;
    args.data = data;
    args.type = type;
    args.dims = dims;
    args.num_dims = num_dims;
    args.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    args.device = devices_args.devices[0];
    if (auto* e = api->PJRT_Client_BufferFromHostBuffer(&args)) return e;
    PJRT_Event_Await_Args await_args;
    std::memset(&await_args, 0, sizeof(await_args));
    await_args.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
    await_args.event = args.done_with_host_buffer;
    if (auto* e = api->PJRT_Event_Await(&await_args)) return e;
    *out = args.buffer;
    return nullptr;
  };

  PJRT_Buffer* pixel_buffer = nullptr;
  PJRT_Buffer* count_buffer = nullptr;
  CHECK_PJRT(api, to_device(pixels.data(), PJRT_Buffer_Type_F32, pixel_dims, 4,
                            &pixel_buffer));
  CHECK_PJRT(api, to_device(&num_prongs, PJRT_Buffer_Type_S32, nullptr, 0,
                            &count_buffer));

  // ---- execute ------------------------------------------------------------
  PJRT_Buffer* input_list[2] = {pixel_buffer, count_buffer};
  PJRT_Buffer* const* input_lists[1] = {input_list};
  std::vector<PJRT_Buffer*> output_storage(8, nullptr);
  PJRT_Buffer** output_list = output_storage.data();
  PJRT_Buffer** output_lists[1] = {output_list};

  PJRT_ExecuteOptions exec_options;
  std::memset(&exec_options, 0, sizeof(exec_options));
  exec_options.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  PJRT_LoadedExecutable_Execute_Args exec_args;
  std::memset(&exec_args, 0, sizeof(exec_args));
  exec_args.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  exec_args.executable = executable;
  exec_args.options = &exec_options;
  exec_args.argument_lists = input_lists;
  exec_args.num_devices = 1;
  exec_args.num_args = 2;
  exec_args.output_lists = output_lists;
  CHECK_PJRT(api, api->PJRT_LoadedExecutable_Execute(&exec_args));

  // ---- read back output 0 (event scores) ----------------------------------
  float event_scores[16] = {0};
  PJRT_Buffer_ToHostBuffer_Args to_host;
  std::memset(&to_host, 0, sizeof(to_host));
  to_host.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
  to_host.src = output_list[0];
  to_host.dst = event_scores;
  to_host.dst_size = sizeof(event_scores);
  CHECK_PJRT(api, api->PJRT_Buffer_ToHostBuffer(&to_host));
  PJRT_Event_Await_Args await_args;
  std::memset(&await_args, 0, sizeof(await_args));
  await_args.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  await_args.event = to_host.event;
  CHECK_PJRT(api, api->PJRT_Event_Await(&await_args));

  std::printf("event scores: %f %f %f %f\n", event_scores[0], event_scores[1],
              event_scores[2], event_scores[3]);
  return 0;
}
