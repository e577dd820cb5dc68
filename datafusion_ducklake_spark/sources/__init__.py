from .scan import ResolvedFile, scan_table  # noqa: F401
