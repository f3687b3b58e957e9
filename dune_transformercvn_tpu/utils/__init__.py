from .rundir import create_run_dir, find_versions

__all__ = ["create_run_dir", "find_versions"]
