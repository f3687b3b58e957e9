"""Data layer tests: schema round-trip, splits, statistics, batch assembly."""

import numpy as np
import pytest

from dune_transformercvn_tpu.config import Options
from dune_transformercvn_tpu.data import Batcher, EventDataset, create_datasets
from dune_transformercvn_tpu.data.schema import (
    IMAGE_HEIGHT,
    IMAGE_WIDTH,
    MAX_PRONGS,
    make_synthetic_file,
    remap_event_current_targets,
)


def test_remap_event_current_targets():
    detailed = np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 9])
    coarse = remap_event_current_targets(detailed)
    assert coarse.tolist() == [0, 0, 0, 0, 1, 1, 1, 1, 2, 3]


def test_dataset_loads_and_splits(synthetic_file):
    ds = EventDataset(synthetic_file, 1.0, event_current_targets=True)
    # The reference slices [indices.min(), indices.max()) and so drops the
    # final event of a range (minkowski_dataset.py:113-120); we keep those
    # split semantics for step-count parity.
    assert ds.num_events == 95
    assert ds.max_particles == MAX_PRONGS
    assert ds.num_event_classes == 4
    assert ds.num_prong_classes == 8
    assert ds.pixel_shape == (IMAGE_HEIGHT, IMAGE_WIDTH)
    # column 0 of the prong mask is forced on
    assert ds.prong_mask[:, 0].all()

    train = EventDataset(synthetic_file, (0.0, 0.75), event_current_targets=True)
    val = EventDataset(synthetic_file, (0.75, 1.0), event_current_targets=True)
    assert len(train) == 71 and len(val) == 23


def test_memmap_and_ram_paths_agree(synthetic_file):
    lazy = EventDataset(synthetic_file, (0.25, 0.75))
    ram = EventDataset(synthetic_file, (0.25, 0.75), load_full_dataset=True)
    idx = np.array([0, 3, 7, 20])
    a = lazy.gather_events(idx)
    b = ram.gather_events(idx)
    for key in a:
        np.testing.assert_array_equal(a[key], b[key], err_msg=key)


def test_statistics_masked(synthetic_file):
    ds = EventDataset(synthetic_file)
    mean, std, em, es = ds.compute_statistics()
    masked = ds.features[ds.prong_mask]
    np.testing.assert_allclose(mean, masked.mean(0), rtol=1e-5)
    assert (std > 0).all()

    # Sharing: a second dataset adopts the provided stats verbatim.
    other = EventDataset(synthetic_file, (0.5, 1.0))
    m2, s2, _, _ = other.compute_statistics(mean, std, em, es)
    np.testing.assert_array_equal(m2, mean)


def test_create_datasets_fractional(synthetic_file):
    options = Options(training_file=synthetic_file)
    options.train_validation_split = 0.75
    train, val, test = create_datasets(options)
    assert len(train) == 71 and len(val) == 23 and test is None


@pytest.mark.parametrize("num_shards", [1, 4])
def test_batcher_static_shapes_and_reconstruction(synthetic_file, num_shards):
    ds = EventDataset(synthetic_file, event_current_targets=True)
    batcher = Batcher(ds, batch_size=8, num_shards=num_shards, coo_granularity=256)
    batch = batcher.build_batch(np.arange(8))
    shape = batcher.shape_of(batch)
    S, b = num_shards, 8 // num_shards

    assert batch["features"].shape == (8, MAX_PRONGS, ds.num_features)
    assert batch["slot_batch"].shape == (S * shape.prong_slots,)
    assert batch["event_owner"].shape == (S * shape.event_hits,)
    # every real prong got exactly one slot
    assert batch["slot_mask"].sum() == ds.prong_mask[np.arange(8)].sum()

    # Reconstruct dense event images from the batch COO and compare against a
    # direct scatter from the raw file banks.
    raw = ds.gather_events(np.arange(8))
    H, W, C = IMAGE_HEIGHT, IMAGE_WIDTH, ds.pixel_features
    direct = np.zeros((8, H, W, C), np.float32)
    np.add.at(
        direct,
        (raw["event_owner"], raw["event_coords"][:, 1], raw["event_coords"][:, 2]),
        raw["event_values"],
    )

    rebuilt = np.zeros((8, H, W, C), np.float32)
    owners = batch["event_owner"].reshape(S, -1)
    xys = batch["event_xy"].reshape(S, -1, 2)
    vals = batch["event_vals"].reshape(S, -1, C)
    for s in range(S):
        real = owners[s] < b
        np.add.at(
            rebuilt,
            (s * b + owners[s][real], xys[s][real, 0], xys[s][real, 1]),
            vals[s][real],
        )
    np.testing.assert_allclose(rebuilt, direct, rtol=1e-6)

    # Prong slots: slot k of shard s must carry prong (slot_batch, slot_pos).
    slot_batch = batch["slot_batch"].reshape(S, -1)
    slot_pos = batch["slot_pos"].reshape(S, -1)
    slot_mask = batch["slot_mask"].reshape(S, -1)
    pr_owner = batch["prong_owner"].reshape(S, -1)
    pr_xy = batch["prong_xy"].reshape(S, -1, 2)
    pr_vals = batch["prong_vals"].reshape(S, -1, C)

    direct_p = np.zeros((8, MAX_PRONGS, H, W, C), np.float32)
    np.add.at(
        direct_p,
        (
            raw["prong_owner"],
            raw["prong_coords"][:, 0],
            raw["prong_coords"][:, 1],
            raw["prong_coords"][:, 2],
        ),
        raw["prong_values"],
    )
    for s in range(S):
        real = pr_owner[s] < shape.prong_slots
        imgs = np.zeros((shape.prong_slots, H, W, C), np.float32)
        np.add.at(
            imgs, (pr_owner[s][real], pr_xy[s][real, 0], pr_xy[s][real, 1]), pr_vals[s][real]
        )
        for k in range(shape.prong_slots):
            if slot_mask[s, k]:
                ev = s * b + slot_batch[s, k]
                np.testing.assert_allclose(imgs[k], direct_p[ev, slot_pos[s, k]], rtol=1e-6)
            else:
                assert not imgs[k].any()


def test_batcher_fixed_shape_single_signature(synthetic_file):
    """fixed_shape: every batch of an epoch shares one static signature and
    the caps bound every realized batch (no overflow)."""
    ds = EventDataset(synthetic_file, event_current_targets=True)
    fixed = Batcher(ds, batch_size=8, num_shards=2, coo_granularity=256,
                    fixed_shape=True, shuffle=True, seed=1)
    dyn = Batcher(ds, batch_size=8, num_shards=2, coo_granularity=256,
                  shuffle=True, seed=1)
    shapes = {fixed.shape_of(b) for b in fixed.epoch(0)}
    assert len(shapes) == 1
    static = shapes.pop()
    for b in dyn.epoch(0):
        s = dyn.shape_of(b)
        assert s.prong_slots <= static.prong_slots
        assert s.event_hits <= static.event_hits
        assert s.prong_hits <= static.prong_hits
    # content identical to the dynamic batcher modulo padding
    fb = fixed.build_batch(np.arange(8))
    db = dyn.build_batch(np.arange(8))
    np.testing.assert_array_equal(fb["event_targets"], db["event_targets"])
    assert fb["slot_mask"].sum() == db["slot_mask"].sum()


def test_batcher_start_batch_skips_in_index_space(synthetic_file):
    """Mid-epoch resume: epoch(start_batch=k) yields exactly the suffix of
    epoch(0) — same batches, nothing rebuilt or reordered."""
    ds = EventDataset(synthetic_file)
    batcher = Batcher(ds, batch_size=16, shuffle=True, seed=9)
    full = list(batcher.epoch(3))
    suffix = list(batcher.epoch(3, start_batch=2))
    assert len(suffix) == len(full) - 2
    for a, b in zip(full[2:], suffix):
        np.testing.assert_array_equal(a["event_targets"], b["event_targets"])
    # pool path agrees as well
    pooled = list(batcher.prefetch_epoch(3, num_workers=3, start_batch=2))
    for a, b in zip(suffix, pooled):
        np.testing.assert_array_equal(a["event_targets"], b["event_targets"])


def test_batcher_epoch_shuffle_determinism(synthetic_file):
    ds = EventDataset(synthetic_file)
    batcher = Batcher(ds, batch_size=16, shuffle=True, seed=3)
    a = batcher.epoch_indices(epoch=1)
    b = batcher.epoch_indices(epoch=1)
    c = batcher.epoch_indices(epoch=2)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert len(list(batcher.epoch(0))) == len(ds) // 16 == batcher.steps_per_epoch()


def test_batcher_tail_marks_padded_rows_invalid(synthetic_file):
    ds = EventDataset(synthetic_file)
    batcher = Batcher(ds, batch_size=16, drop_last=False)
    batches = list(batcher.epoch(0))
    tail = batches[-1]
    n_real = len(ds) % 16
    assert n_real != 0
    # wrapped rows carry -1 targets; real rows keep theirs
    assert (tail["event_targets"][n_real:] == -1).all()
    assert (tail["prong_targets"][n_real:] == -1).all()
    tail_indices = np.arange(16 * (len(ds) // 16), len(ds))
    np.testing.assert_array_equal(
        tail["event_targets"][:n_real], ds.event_targets[tail_indices]
    )
    # fixed-shape caps hold even for the wrap-padded tail
    fixed = Batcher(ds, batch_size=16, drop_last=False, fixed_shape=True)
    for batch in fixed.epoch(0):
        pass  # no cap-overflow ValueError


def test_batcher_drops_prong_hit_past_event_count(tmp_path):
    """A prong hit whose prong index exceeds its event's real prong count
    must be dropped, not scattered into a neighboring event's packed slots
    (the slot arithmetic alone would land it there)."""
    import h5py

    clean_path = str(tmp_path / "clean.h5")
    make_synthetic_file(clean_path, num_events=10, seed=11)  # split keeps >= 8
    bad_path = str(tmp_path / "malformed.h5")
    make_synthetic_file(bad_path, num_events=10, seed=11)

    # corrupt one in-range prong hit of event 0: prong index -> past count
    # (mutate before any EventDataset holds the file open)
    with h5py.File(bad_path, "r+") as f:
        lo = int(f["prong_compressed_index"][0, 0])
        hi = int(f["prong_compressed_index"][0, 1])
        assert hi > lo, "event 0 has no prong hits in this fixture"
        n_prongs0 = int(np.asarray(f["prong_mask"][0]).sum())
        coords = f["prong_pixels_coordinates"]
        row = np.asarray(coords[lo])
        row[0] = n_prongs0 + 1           # past event 0's real prongs
        coords[lo] = row

    clean = Batcher(
        EventDataset(clean_path), batch_size=8, coo_granularity=256
    ).build_batch(np.arange(8))
    cap = clean["slot_batch"].shape[0]
    n_clean = int((clean["prong_owner"] < cap).sum())

    bad = Batcher(
        EventDataset(bad_path), batch_size=8, coo_granularity=256
    ).build_batch(np.arange(8))
    owners = bad["prong_owner"]
    # exactly the corrupted hit vanished from the in-range bank
    assert int((owners < cap).sum()) == n_clean - 1
    # CSR offsets exclude it too (counts cover exactly the in-range rows)
    assert int(bad["prong_starts"][-1]) == n_clean - 1
    # and no owner points outside each event's own slot range
    slot_batch = bad["slot_batch"]
    real = owners < cap
    np.testing.assert_array_equal(
        slot_batch[owners[real]],
        slot_batch[clean["prong_owner"][clean["prong_owner"] < cap]][
            np.arange(n_clean) != 0
        ],
    )


def test_batcher_fixed_caps_tight_on_skewed_data(tmp_path):
    """Fixed-shape caps use the sum of the top-b per-event counts, not
    ``b * max``: one 4,000-hit event among ~40-hit events no longer forces
    a 64k-row COO bucket onto every batch — and the caps still bound every
    realized batch, including shuffled epochs and the wrap-padded tail."""
    import h5py

    path = str(tmp_path / "skew.h5")
    make_synthetic_file(path, num_events=70, mean_hits_per_image=40, seed=2)
    # Graft one giant event image (heavy-tailed skew) onto event 64 — the
    # FIRST event of the wrap-padded tail (70 % 16 = 6, tail = events
    # 64..69), so np.resize duplicates it 3x in the tail batch and the
    # distinct-events top-b bound alone would under-count: the epoch loop
    # below only passes if the exact tail duplicate bound is applied.
    giant_event = 64
    with h5py.File(path, "r+") as f:
        idx = f["event_compressed_index"][:]
        coords = f["event_pixels_coordinates"][:]
        values = f["event_pixels_values"][:]
        rng = np.random.default_rng(0)
        big = 4000
        bx = rng.integers(0, 400, big)
        by = rng.integers(0, 280, big)
        big_coords = np.stack([np.zeros(big, np.int64), bx, by], 1)
        big_values = rng.uniform(1, 255, (big, values.shape[1])).astype(
            values.dtype)
        lo, hi = idx[giant_event]
        new_coords = np.concatenate([coords[:lo], big_coords, coords[hi:]])
        new_values = np.concatenate([values[:lo], big_values, values[hi:]])
        shift = big - (hi - lo)
        idx[giant_event] = (lo, lo + big)
        idx[giant_event + 1:] += shift
        del f["event_pixels_coordinates"], f["event_pixels_values"]
        del f["event_compressed_index"]
        f.create_dataset("event_pixels_coordinates", data=new_coords)
        f.create_dataset("event_pixels_values", data=new_values)
        f.create_dataset("event_compressed_index", data=idx)

    ds = EventDataset(path)
    b = 16
    fixed = Batcher(ds, batch_size=b, coo_granularity=256, fixed_shape=True,
                    shuffle=True, seed=4)
    counts = ds.event_compressed_index[:, 1] - ds.event_compressed_index[:, 0]
    top_b = np.sort(counts)[::-1][:b].sum()
    assert fixed.fixed_caps.event_hits < b * counts.max() / 4
    assert fixed.fixed_caps.event_hits >= top_b
    for epoch in range(3):
        for batch in fixed.epoch(epoch):  # no cap-overflow ValueError
            assert batch["event_owner"].shape[0] == fixed.fixed_caps.event_hits

    # unshuffled tail that wrap-duplicates the heavy event: 70 % 16 = 6, so
    # moving the giant to the tail region exercises the duplicate bound
    tail_fixed = Batcher(ds, batch_size=b, coo_granularity=256,
                         fixed_shape=True, drop_last=False)
    for batch in tail_fixed.epoch(0):
        pass


def test_batcher_prefetch_matches_sync(synthetic_file):
    ds = EventDataset(synthetic_file)
    batcher = Batcher(ds, batch_size=16, shuffle=True, seed=5)
    sync = list(batcher.epoch(0))
    pre = list(batcher.prefetch_epoch(0))
    assert len(sync) == len(pre)
    for x, y in zip(sync, pre):
        np.testing.assert_array_equal(x["event_targets"], y["event_targets"])
        np.testing.assert_array_equal(x["prong_vals"], y["prong_vals"])


def test_batcher_local_shard_assembly(synthetic_file):
    """Host-local assembly (multi-host: each host packs only its shards)
    must be bit-equal to the matching shard blocks of the full assembly,
    for plain, tail-padded, and fixed-shape batchers."""
    from dune_transformercvn_tpu.parallel.mesh import local_batch_rows

    ds = EventDataset(synthetic_file, event_current_targets=True)
    for kwargs in (
        dict(),
        dict(fixed_shape=True),
    ):
        full_b = Batcher(ds, batch_size=8, num_shards=4,
                         coo_granularity=256, **kwargs)
        idx = np.arange(8) + 5
        full = full_b.build_batch(idx)
        for shards in ([0], [1, 3], [2, 0]):
            local = full_b.build_batch(idx, shards=shards)
            for key in full:
                want = np.concatenate([
                    local_batch_rows(full[key], 4, [s]) for s in shards
                ])
                np.testing.assert_array_equal(
                    local[key], want, err_msg=f"{key} shards={shards} {kwargs}"
                )

    # constructor-pinned local shards apply to epoch iteration + tails
    pinned = Batcher(ds, batch_size=8, num_shards=4, coo_granularity=256,
                     drop_last=False, local_shards=[1, 2])
    reference = Batcher(ds, batch_size=8, num_shards=4, coo_granularity=256,
                        drop_last=False)
    for local, full in zip(pinned.epoch(0), reference.epoch(0)):
        for key in full:
            want = local_batch_rows(full[key], 4, [1, 2])
            np.testing.assert_array_equal(local[key], want, err_msg=key)

    # out-of-range shard ids are rejected loudly
    with pytest.raises(ValueError):
        Batcher(ds, batch_size=8, num_shards=4, local_shards=[4])
