from dedupe_ray.sources.pages import read_pages, coerce_pages_schema  # noqa: F401
