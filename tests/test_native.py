"""Native C++ COO engine: build, parity with the numpy fallbacks."""

import numpy as np
import pytest

from dune_transformercvn_tpu.ops.coo_conv import build_conv_maps_numpy
from dune_transformercvn_tpu.utils.native import (
    native_available,
    native_build_conv_maps,
    native_gather_ranges,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native engine could not be built"
)


@pytest.mark.parametrize("kernel,stride", [(3, 1), (7, 2), (2, 2)])
def test_native_conv_maps_match_numpy(kernel, stride):
    rng = np.random.default_rng(0)
    h, w = 24, 20
    occ = rng.uniform(size=(3, h, w)) < 0.1
    coords = np.argwhere(occ).astype(np.int64)

    ref = build_conv_maps_numpy(coords, kernel, stride, h, w)
    out_coords, num_out, in_maps, out_maps = native_build_conv_maps(
        coords, kernel, stride, h, w
    )

    assert num_out == ref.num_out
    # same output coordinate set (orders differ: insertion vs sorted)
    ref_set = {tuple(c) for c in ref.out_coords[: ref.num_out]}
    nat_set = {tuple(c) for c in out_coords}
    assert ref_set == nat_set

    # same (in coord, out coord) pair multiset per kernel offset
    nat_coord = {i: tuple(c) for i, c in enumerate(out_coords)}
    ref_coord = {i: tuple(c) for i, c in enumerate(ref.out_coords[: ref.num_out])}
    for j in range(kernel * kernel):
        def pairs(in_map, out_map, n_pad, coord_of):
            result = set()
            for i, o in zip(in_map, out_map):
                if i < n_pad:
                    result.add((i, coord_of[o]))
            return result

        nat_pairs = pairs(in_maps[j], out_maps[j], len(coords), nat_coord)
        ref_pairs = pairs(ref.in_maps[j], ref.out_maps[j], len(coords), ref_coord)
        assert nat_pairs == ref_pairs, f"offset {j}"


def test_native_gather_ranges_matches_loop():
    rng = np.random.default_rng(1)
    total, c = 500, 3
    coords = rng.integers(0, 100, (total, 3)).astype(np.int64)
    values = rng.normal(size=(total, c)).astype(np.float32)
    bounds = np.sort(rng.choice(total, 8, replace=False))
    ranges = np.stack([bounds[:-1], bounds[1:]], axis=1).astype(np.int64)

    out = native_gather_ranges(ranges, coords, values)
    assert out is not None
    coords_out, values_out, owner_out = out

    expected_c = np.concatenate([coords[a:b] for a, b in ranges])
    expected_v = np.concatenate([values[a:b] for a, b in ranges])
    expected_o = np.concatenate(
        [np.full(b - a, i) for i, (a, b) in enumerate(ranges)]
    )
    np.testing.assert_array_equal(coords_out, expected_c)
    np.testing.assert_array_equal(values_out, expected_v)
    np.testing.assert_array_equal(owner_out, expected_o)


def test_dataset_native_path_matches_python(tmp_path):
    from dune_transformercvn_tpu.data.dataset import EventDataset
    from dune_transformercvn_tpu.data.schema import make_synthetic_file

    path = str(tmp_path / "n.h5")
    make_synthetic_file(path, num_events=40, seed=5)
    ram = EventDataset(path, load_full_dataset=True)     # native fast path
    lazy = EventDataset(path, load_full_dataset=False)   # python loop path
    idx = np.array([1, 5, 17, 30])
    a, b = ram.gather_events(idx), lazy.gather_events(idx)
    for key in a:
        np.testing.assert_array_equal(
            np.asarray(a[key]), np.asarray(b[key]), err_msg=key
        )
