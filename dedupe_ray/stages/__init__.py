"""Ray Data batch transforms — the engine's operators.

Each stage is either a plain function (stateless tasks) or a callable class
(actor pool) intended for ``Dataset.map_batches``/compositions, always over
``batch_format="pyarrow"`` unless a kernel genuinely needs pandas/numpy.
"""

from dedupe_ray.stages.extract import ExtractText  # noqa: F401
from dedupe_ray.stages.signatures import SignatureStage  # noqa: F401
from dedupe_ray.stages.banding import minhash_band_table, simhash_band_table  # noqa: F401
from dedupe_ray.stages.groupapply import sorted_group_apply  # noqa: F401
from dedupe_ray.stages.candidates import candidate_edges, verify_edges  # noqa: F401
from dedupe_ray.stages.clustering import connected_components  # noqa: F401
