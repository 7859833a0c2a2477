from .pipeline import ingest_source, normalize_records, device_specs_view  # noqa: F401
