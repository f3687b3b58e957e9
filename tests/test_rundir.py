"""Versioned run-dir helpers (`utils/rundir.py`): the TensorBoardLogger
convention the reference relies on (reference train.py:103-105), plus the
`--auto_resume` candidate scan built on them (train.py:114-125)."""

from dune_transformercvn_tpu.utils.rundir import (
    create_run_dir,
    find_resumable,
    find_versions,
)


def test_find_versions_numeric_order_and_filtering(tmp_path):
    base = tmp_path / "run"
    for entry in ("version_0", "version_9", "version_10", "version_2"):
        (base / entry).mkdir(parents=True)
    # distractors: wrong pattern, files, non-numeric
    (base / "version_x").mkdir()
    (base / "checkpoints").mkdir()
    (base / "version_3").write_text("a file, not a dir")
    assert find_versions(str(tmp_path), "run") == [0, 2, 9, 10]
    assert find_versions(str(tmp_path), "missing") == []


def test_create_run_dir_increments_numerically(tmp_path):
    first = create_run_dir(str(tmp_path), "run")
    assert first.endswith("version_0")
    (tmp_path / "run" / "version_9").mkdir()
    # version_10 must follow version_9 (lexical order would pick version_91)
    assert create_run_dir(str(tmp_path), "run").endswith("version_10")
    assert create_run_dir(str(tmp_path), "run").endswith("version_11")


def test_create_run_dir_skips_claimed_versions(tmp_path):
    # a concurrent launch claimed the next slot between scan and mkdir:
    # the exist_ok=False loop must move past it, not crash or reuse it
    create_run_dir(str(tmp_path), "run")
    (tmp_path / "run" / "version_1").mkdir()
    assert create_run_dir(str(tmp_path), "run").endswith("version_2")


def test_auto_resume_picks_newest_dir_with_checkpoints(tmp_path):
    """The train.py --auto_resume scan (`find_resumable`): newest version
    that has a checkpoint index, skipping newer dirs that died before their
    first save."""
    assert find_resumable(str(tmp_path), "run") is None
    for version, with_ckpt in ((0, True), (1, True), (2, False)):
        d = tmp_path / "run" / f"version_{version}"
        (d / "checkpoints").mkdir(parents=True)
        if with_ckpt:
            (d / "checkpoints" / "index.json").write_text("{}")

    chosen = find_resumable(str(tmp_path), "run")
    assert chosen is not None and chosen.endswith("version_1")
