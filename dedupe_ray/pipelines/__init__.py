from dedupe_ray.pipelines.neardup import (  # noqa: F401
    signatures_dataset,
    match_edges,
    near_duplicates,
)
from dedupe_ray.pipelines.exact import exact_dedup  # noqa: F401
from dedupe_ray.pipelines.compare import compare  # noqa: F401
