"""Pure, deterministic, vectorized kernels. No Ray imports here.

These are the engine's analog of the reference's ``hash`` and ``utils``
packages (/root/reference/hash/hash.go, /root/reference/utils/resize.go):
everything that turns one record into a signature, and the pairwise metrics.
Determinism is a hard requirement (BASELINE.json:input_hint — byte-identical
text per url), so nothing here uses Python's salted ``hash()``, wall-clock,
or unseeded randomness.
"""

from dedupe_ray.functions.text import (  # noqa: F401
    extract_text,
    extract_text_batch,
    normalize_tokens,
)
from dedupe_ray.functions.hashing import (  # noqa: F401
    hash_tokens,
    hash_urls,
    shingle_hashes,
)
from dedupe_ray.functions.simhash import simhash64, simhash64_batch  # noqa: F401
from dedupe_ray.functions.minhash import MinHasher  # noqa: F401
from dedupe_ray.functions.metrics import (  # noqa: F401
    hamming64,
    jaccard_exact,
    jaccard_minhash,
    jaro_winkler,
)
