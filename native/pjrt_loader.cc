// PJRT loader for the exported TransformerCVN StableHLO graphs.
//
// This is the C++ inference hook replacing the reference's
// TorchScript-in-LArSoft flow (CreateCompiled.ipynb cell 14 -> the ART
// module loads `<prefix>_{pid,embeddings,combined}.torchscript`): it
// loads the inner StableHLO portable artifact written by
// dune_transformercvn_tpu/export.py (`*.stablehlo.mlirbc` — the
// `Exported.mlir_module_serialized` bytes; PJRT_Client_Compile does NOT
// accept the outer jax.export envelope) and executes it through the
// PJRT C API, the stable ABI every XLA backend (TPU libtpu, CPU, GPU)
// exposes.
//
// Build:   make -C native pjrt_loader
// Run:     ./pjrt_loader <plugin.so> <model> <meta.json>
//              <pixels.bin> <num_prongs> <out.bin> [key=int:V|key=str:V ...]
//
//   plugin.so   a PJRT plugin exporting GetPjrtApi (libtpu.so, a CPU
//               plugin, or this sandbox's tunnel plugin)
//   model       either an explicit `*.stablehlo.mlirbc` artifact (input
//               geometry = the meta's "input_shape"), or a variant prefix
//               like `/dir/transformercvn_pid` — the loader then picks an
//               exported prong-capacity bucket P >= num_prongs from the
//               meta's "prong_buckets" ladder (the cheapest per the meta's
//               measured "bucket_ms" when present, else the smallest) and loads
//               `<prefix>_pP.stablehlo.mlirbc` (the full capacity keeps
//               the unsuffixed name), so serving cost scales with the real
//               prong count instead of max_prongs (the static-shape
//               replacement for CreateCompiled.ipynb's dynamic-Npng
//               TorchScript graphs)
//   meta.json   the `<prefix>_export_meta.json` written by export.py
//   pixels.bin  raw float32 (event map first, prong maps padded to
//               max_prongs rows, raw 0-255 counts); in bucket mode the
//               loader feeds only the first 1+P rows to the device
//   num_prongs  real prong count (the graph masks rows past it)
//   out.bin     all outputs, each as: u32 rank, i64 dims[rank],
//               u32 pjrt_dtype, raw bytes (little-endian host layout)
//   key=...     optional PJRT_Client_Create options (plugin-specific)
//
// Exit 0 on success. tests/test_pjrt_loader.py builds this, runs the
// exported `pid` graph on the TPU plugin at two ladder capacities, and
// checks the outputs match the Python-side logits.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <dlfcn.h>
#include <fstream>
#include <map>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

static const PJRT_Api* g_api = nullptr;

#define CHECK_PJRT(err, what)                                             \
  do {                                                                    \
    PJRT_Error* _e = (err);                                               \
    if (_e != nullptr) {                                                  \
      PJRT_Error_Message_Args _m;                                         \
      std::memset(&_m, 0, sizeof(_m));                                    \
      _m.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;               \
      _m.error = _e;                                                      \
      g_api->PJRT_Error_Message(&_m);                                     \
      std::fprintf(stderr, "%s failed: %.*s\n", what,                     \
                   static_cast<int>(_m.message_size), _m.message);        \
      return 1;                                                           \
    }                                                                     \
  } while (0)

static std::string ReadFile(const char* path) {
  std::ifstream file(path, std::ios::binary);
  if (!file) {
    std::fprintf(stderr, "cannot read %s\n", path);
    std::exit(2);
  }
  return std::string(std::istreambuf_iterator<char>(file), {});
}

// Pull "key": [a, b, c, d] out of the export metadata. A full JSON
// parser is overkill for fixed-layout keys written by our own exporter.
static std::vector<int64_t> ParseIntArray(const std::string& json,
                                          const char* key_name) {
  std::vector<int64_t> dims;
  size_t key = json.find(std::string("\"") + key_name + "\"");
  if (key == std::string::npos) return dims;
  size_t open = json.find('[', key);
  size_t close = json.find(']', open);
  if (open == std::string::npos || close == std::string::npos) return dims;
  const char* p = json.c_str() + open + 1;
  const char* end = json.c_str() + close;
  while (p < end) {
    char* next = nullptr;
    long long v = std::strtoll(p, &next, 10);
    if (next == p) { ++p; continue; }
    dims.push_back(v);
    p = next;
  }
  return dims;
}

static bool EndsWith(const std::string& s, const std::string& suffix) {
  return s.size() >= suffix.size() &&
         s.compare(s.size() - suffix.size(), suffix.size(), suffix) == 0;
}

// Pull the optional "bucket_ms": {"4": 1.55, "8": 2.62, ...} object out of
// the export metadata (written by export.py `bench_buckets`): measured
// per-event ms of each rung's pid graph on the serving backend.
static std::map<int64_t, double> ParseBucketCosts(const std::string& json) {
  std::map<int64_t, double> costs;
  size_t key = json.find("\"bucket_ms\"");
  if (key == std::string::npos) return costs;
  size_t open = json.find('{', key);
  size_t close = json.find('}', open);
  if (open == std::string::npos || close == std::string::npos) return costs;
  size_t p = open + 1;
  while (p < close) {
    size_t q1 = json.find('"', p);
    if (q1 == std::string::npos || q1 >= close) break;
    size_t q2 = json.find('"', q1 + 1);
    if (q2 == std::string::npos || q2 >= close) break;
    size_t colon = json.find(':', q2);
    if (colon == std::string::npos || colon >= close) break;
    const long long bucket = std::strtoll(json.c_str() + q1 + 1, nullptr, 10);
    costs[bucket] = std::strtod(json.c_str() + colon + 1, nullptr);
    size_t comma = json.find(',', colon);
    p = (comma == std::string::npos || comma > close) ? close : comma + 1;
  }
  return costs;
}

// Minimal protobuf writer for the default xla.CompileOptionsProto:
//   field 3 (len-delim): ExecutableBuildOptionsProto {
//     field 4 (varint): num_replicas = 1
//     field 5 (varint): num_partitions = 1
//   }
static std::string DefaultCompileOptions() {
  std::string build;
  build.push_back(static_cast<char>((4 << 3) | 0));
  build.push_back(1);
  build.push_back(static_cast<char>((5 << 3) | 0));
  build.push_back(1);
  std::string out;
  out.push_back(static_cast<char>((3 << 3) | 2));
  out.push_back(static_cast<char>(build.size()));
  out += build;
  return out;
}

int main(int argc, char** argv) {
  if (argc < 7) {
    std::fprintf(stderr,
                 "usage: %s <plugin.so> <model.stablehlo.mlirbc> <meta.json> "
                 "<pixels.bin> <num_prongs> <out.bin> [key=int:V|key=str:V ...]\n",
                 argv[0]);
    return 2;
  }
  const char* plugin_path = argv[1];
  const std::string model_spec = argv[2];
  const char* meta_path = argv[3];
  const char* pixels_path = argv[4];
  const int32_t num_prongs = static_cast<int32_t>(std::atoi(argv[5]));
  const char* out_path = argv[6];

  // ---- resolve the artifact + input geometry from the metadata --------
  const std::string meta = ReadFile(meta_path);
  std::vector<int64_t> pixel_dims = ParseIntArray(meta, "input_shape");
  if (pixel_dims.empty()) {
    std::fprintf(stderr, "no \"input_shape\" in %s\n", meta_path);
    return 2;
  }
  std::string artifact_path = model_spec;
  if (!EndsWith(model_spec, ".mlirbc")) {
    // Variant-prefix mode: pick an exported prong-capacity bucket >=
    // num_prongs (export.py `select_bucket`'s C++ mirror).  When the meta
    // carries measured per-rung costs ("bucket_ms", export.py
    // `bench_buckets`) for every eligible rung, dispatch to the CHEAPEST
    // one (rung cost is not monotone in capacity — XLA's conv-strategy
    // choice flips between compilations of nearby shapes; ties break to
    // the smaller capacity).  Otherwise: the smallest eligible rung.
    const std::vector<int64_t> buckets = ParseIntArray(meta, "prong_buckets");
    const std::map<int64_t, double> costs = ParseBucketCosts(meta);
    const int64_t max_prongs = pixel_dims[0] - 1;
    std::vector<int64_t> eligible;
    for (int64_t b : buckets)
      if (b >= num_prongs) eligible.push_back(b);
    if (eligible.empty()) eligible.push_back(max_prongs);
    bool cost_aware = !costs.empty();
    for (int64_t b : eligible)
      if (costs.find(b) == costs.end()) { cost_aware = false; break; }
    int64_t chosen = eligible[0];
    for (int64_t b : eligible) {
      if (cost_aware ? (costs.at(b) < costs.at(chosen) ||
                        (costs.at(b) == costs.at(chosen) && b < chosen))
                     : (b < chosen))
        chosen = b;
    }
    artifact_path = model_spec +
                    (chosen == max_prongs ? std::string("")
                                          : "_p" + std::to_string(chosen)) +
                    ".stablehlo.mlirbc";
    pixel_dims[0] = 1 + chosen;
    if (cost_aware)
      std::fprintf(stderr, "num_prongs %d -> bucket %lld [cost-aware %.3f ms] (%s)\n",
                   num_prongs, static_cast<long long>(chosen),
                   costs.at(chosen), artifact_path.c_str());
    else
      std::fprintf(stderr, "num_prongs %d -> bucket %lld (%s)\n", num_prongs,
                   static_cast<long long>(chosen), artifact_path.c_str());
  }

  // ---- load the backend plugin ---------------------------------------
  void* plugin = dlopen(plugin_path, RTLD_NOW | RTLD_LOCAL);
  if (plugin == nullptr) {
    std::fprintf(stderr, "dlopen failed: %s\n", dlerror());
    return 1;
  }
  auto get_api =
      reinterpret_cast<const PJRT_Api* (*)()>(dlsym(plugin, "GetPjrtApi"));
  if (get_api == nullptr) {
    std::fprintf(stderr, "plugin has no GetPjrtApi symbol\n");
    return 1;
  }
  g_api = get_api();
  const PJRT_Api* api = g_api;

  {
    PJRT_Plugin_Initialize_Args init;
    std::memset(&init, 0, sizeof(init));
    init.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
    CHECK_PJRT(api->PJRT_Plugin_Initialize(&init), "PJRT_Plugin_Initialize");
  }

  // ---- create the client (plugin-specific options from argv) ---------
  std::vector<std::string> opt_storage;  // keeps c_str()s alive
  opt_storage.reserve(static_cast<size_t>(argc) * 2);
  std::vector<PJRT_NamedValue> options;
  for (int i = 7; i < argc; ++i) {
    const char* eq = std::strchr(argv[i], '=');
    if (eq == nullptr) {
      std::fprintf(stderr, "bad option (want key=int:V or key=str:V): %s\n",
                   argv[i]);
      return 2;
    }
    opt_storage.emplace_back(argv[i], eq - argv[i]);  // key
    const std::string& key = opt_storage.back();
    PJRT_NamedValue nv;
    std::memset(&nv, 0, sizeof(nv));
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = key.c_str();
    nv.name_size = key.size();
    if (std::strncmp(eq + 1, "int:", 4) == 0) {
      nv.type = PJRT_NamedValue_kInt64;
      nv.int64_value = std::strtoll(eq + 5, nullptr, 10);
      nv.value_size = 1;
    } else if (std::strncmp(eq + 1, "str:", 4) == 0) {
      opt_storage.emplace_back(eq + 5);
      nv.type = PJRT_NamedValue_kString;
      nv.string_value = opt_storage.back().c_str();
      nv.value_size = opt_storage.back().size();
    } else {
      std::fprintf(stderr, "bad option value (want int:V or str:V): %s\n",
                   argv[i]);
      return 2;
    }
    options.push_back(nv);
  }

  PJRT_Client_Create_Args create_args;
  std::memset(&create_args, 0, sizeof(create_args));
  create_args.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  create_args.create_options = options.data();
  create_args.num_options = options.size();
  CHECK_PJRT(api->PJRT_Client_Create(&create_args), "PJRT_Client_Create");
  PJRT_Client* client = create_args.client;

  // ---- compile the inner StableHLO portable artifact -----------------
  const std::string artifact = ReadFile(artifact_path.c_str());
  PJRT_Program program;
  std::memset(&program, 0, sizeof(program));
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = const_cast<char*>(artifact.data());
  program.code_size = artifact.size();
  static const char kFormat[] = "mlir";
  program.format = kFormat;
  program.format_size = sizeof(kFormat) - 1;

  const std::string compile_options = DefaultCompileOptions();
  PJRT_Client_Compile_Args compile_args;
  std::memset(&compile_args, 0, sizeof(compile_args));
  compile_args.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  compile_args.client = client;
  compile_args.program = &program;
  compile_args.compile_options = compile_options.data();
  compile_args.compile_options_size = compile_options.size();
  CHECK_PJRT(api->PJRT_Client_Compile(&compile_args), "PJRT_Client_Compile");
  PJRT_LoadedExecutable* executable = compile_args.executable;
  std::fprintf(stderr, "compiled %s (%zu bytes) through %s\n",
               artifact_path.c_str(), artifact.size(), plugin_path);

  // ---- host inputs ----------------------------------------------------
  int64_t pixel_count = 1;
  for (int64_t d : pixel_dims) pixel_count *= d;
  const std::string pixels = ReadFile(pixels_path);
  // Callers always pad to max_prongs rows; a bucketed graph reads only
  // the first 1+P rows, so the file may be larger than the graph input.
  if (pixels.size() < static_cast<size_t>(pixel_count) * sizeof(float)) {
    std::fprintf(stderr, "%s holds %zu bytes, input shape wants %lld floats\n",
                 pixels_path, pixels.size(),
                 static_cast<long long>(pixel_count));
    return 2;
  }

  PJRT_Client_Devices_Args devices_args;
  std::memset(&devices_args, 0, sizeof(devices_args));
  devices_args.struct_size = PJRT_Client_Devices_Args_STRUCT_SIZE;
  devices_args.client = client;
  CHECK_PJRT(api->PJRT_Client_Devices(&devices_args), "PJRT_Client_Devices");
  if (devices_args.num_devices == 0) {
    std::fprintf(stderr, "plugin reports zero devices\n");
    return 1;
  }
  PJRT_Device* device = devices_args.devices[0];

  auto to_device = [&](const void* data, PJRT_Buffer_Type type,
                       const int64_t* dims, size_t num_dims,
                       PJRT_Buffer** out) -> PJRT_Error* {
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
    args.device = device;
    if (PJRT_Error* e = api->PJRT_Client_BufferFromHostBuffer(&args)) return e;
    PJRT_Event_Await_Args await_args;
    std::memset(&await_args, 0, sizeof(await_args));
    await_args.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
    await_args.event = args.done_with_host_buffer;
    if (PJRT_Error* e = api->PJRT_Event_Await(&await_args)) return e;
    PJRT_Event_Destroy_Args destroy_args;
    std::memset(&destroy_args, 0, sizeof(destroy_args));
    destroy_args.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
    destroy_args.event = args.done_with_host_buffer;
    api->PJRT_Event_Destroy(&destroy_args);
    *out = args.buffer;
    return nullptr;
  };

  PJRT_Buffer* pixel_buffer = nullptr;
  PJRT_Buffer* count_buffer = nullptr;
  CHECK_PJRT(to_device(pixels.data(), PJRT_Buffer_Type_F32, pixel_dims.data(),
                       pixel_dims.size(), &pixel_buffer),
             "BufferFromHostBuffer(pixels)");
  CHECK_PJRT(to_device(&num_prongs, PJRT_Buffer_Type_S32, nullptr, 0,
                       &count_buffer),
             "BufferFromHostBuffer(num_prongs)");

  // ---- execute ---------------------------------------------------------
  PJRT_LoadedExecutable_GetExecutable_Args get_exec;
  std::memset(&get_exec, 0, sizeof(get_exec));
  get_exec.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
  get_exec.loaded_executable = executable;
  CHECK_PJRT(api->PJRT_LoadedExecutable_GetExecutable(&get_exec),
             "GetExecutable");
  PJRT_Executable_NumOutputs_Args num_out_args;
  std::memset(&num_out_args, 0, sizeof(num_out_args));
  num_out_args.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
  num_out_args.executable = get_exec.executable;
  CHECK_PJRT(api->PJRT_Executable_NumOutputs(&num_out_args),
             "Executable_NumOutputs");
  const size_t num_outputs = num_out_args.num_outputs;

  PJRT_Buffer* input_list[2] = {pixel_buffer, count_buffer};
  PJRT_Buffer* const* input_lists[1] = {input_list};
  std::vector<PJRT_Buffer*> output_storage(num_outputs, nullptr);
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
  CHECK_PJRT(api->PJRT_LoadedExecutable_Execute(&exec_args), "Execute");

  // ---- stream every output to out.bin ---------------------------------
  std::ofstream out(out_path, std::ios::binary);
  const uint32_t n_out = static_cast<uint32_t>(num_outputs);
  out.write(reinterpret_cast<const char*>(&n_out), sizeof(n_out));
  for (size_t i = 0; i < num_outputs; ++i) {
    PJRT_Buffer* buf = output_list[i];

    PJRT_Buffer_Dimensions_Args dim_args;
    std::memset(&dim_args, 0, sizeof(dim_args));
    dim_args.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
    dim_args.buffer = buf;
    CHECK_PJRT(api->PJRT_Buffer_Dimensions(&dim_args), "Buffer_Dimensions");

    PJRT_Buffer_ElementType_Args type_args;
    std::memset(&type_args, 0, sizeof(type_args));
    type_args.struct_size = PJRT_Buffer_ElementType_Args_STRUCT_SIZE;
    type_args.buffer = buf;
    CHECK_PJRT(api->PJRT_Buffer_ElementType(&type_args), "Buffer_ElementType");

    // Request a dense row-major host layout — a null host_layout means
    // "device layout", which on TPU is tiled/transposed.
    std::vector<int64_t> minor_to_major(dim_args.num_dims);
    for (size_t d = 0; d < dim_args.num_dims; ++d)
      minor_to_major[d] = static_cast<int64_t>(dim_args.num_dims - 1 - d);
    PJRT_Buffer_MemoryLayout layout;
    std::memset(&layout, 0, sizeof(layout));
    layout.struct_size = PJRT_Buffer_MemoryLayout_STRUCT_SIZE;
    layout.type = PJRT_Buffer_MemoryLayout_Type_Tiled;
    layout.tiled.struct_size = PJRT_Buffer_MemoryLayout_Tiled_STRUCT_SIZE;
    layout.tiled.minor_to_major = minor_to_major.data();
    layout.tiled.minor_to_major_size = minor_to_major.size();

    // First call with dst=nullptr reports the required host size.
    PJRT_Buffer_ToHostBuffer_Args to_host;
    std::memset(&to_host, 0, sizeof(to_host));
    to_host.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    to_host.src = buf;
    to_host.host_layout = &layout;
    CHECK_PJRT(api->PJRT_Buffer_ToHostBuffer(&to_host), "ToHostBuffer(size)");
    std::vector<char> host(to_host.dst_size);
    to_host.dst = host.data();
    CHECK_PJRT(api->PJRT_Buffer_ToHostBuffer(&to_host), "ToHostBuffer(copy)");
    PJRT_Event_Await_Args await_args;
    std::memset(&await_args, 0, sizeof(await_args));
    await_args.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
    await_args.event = to_host.event;
    CHECK_PJRT(api->PJRT_Event_Await(&await_args), "Await(d2h)");

    const uint32_t rank = static_cast<uint32_t>(dim_args.num_dims);
    const uint32_t dtype = static_cast<uint32_t>(type_args.type);
    out.write(reinterpret_cast<const char*>(&rank), sizeof(rank));
    out.write(reinterpret_cast<const char*>(dim_args.dims),
              sizeof(int64_t) * rank);
    out.write(reinterpret_cast<const char*>(&dtype), sizeof(dtype));
    out.write(host.data(), static_cast<std::streamsize>(host.size()));
    std::fprintf(stderr, "output %zu: rank %u, %zu bytes, pjrt dtype %u\n", i,
                 rank, host.size(), dtype);
  }
  out.close();
  std::printf("wrote %zu outputs to %s\n", num_outputs, out_path);
  return 0;
}
