from .synthetic import saved_list, source_list, SOURCES  # noqa: F401
