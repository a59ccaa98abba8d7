from dedupe_ray.fixtures.pages import generate_pages, PAGES_SCHEMA  # noqa: F401
