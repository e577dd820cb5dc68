from . import cdc_source, sessionize, windows  # noqa: F401
