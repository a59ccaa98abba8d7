"""Document quality / statistics kernels — fully vectorized via pyarrow.compute.

Integer counts are computed with Arrow C kernels (``count_substring_regex``)
so a 100 TB corpus never touches a Python loop for these. Ratios are derived
from the counts. Patterns are module-level constants so the SQL oracles in
``__ray_entry__.oracle_sql`` can mirror them exactly.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["doc_stats_table", "quality_score_table", "TOKEN_RE", "PUNCT_RE", "DIGIT_RE", "UPPER_RE"]

TOKEN_RE = r"[^\s]+"          # whitespace-delimited tokens
PUNCT_RE = r"[.,;:!?]"
DIGIT_RE = r"[0-9]"
UPPER_RE = r"[A-Z]"
WORD_RE = r"[a-zA-Z]+"


def doc_stats_table(text: pa.ChunkedArray | pa.Array) -> dict[str, pa.Array]:
    """Integer per-document stats — exact, order-independent, oracle-friendly."""
    return {
        "n_chars2": pc.utf8_length(text),
        "n_tokens": pc.count_substring_regex(text, TOKEN_RE),
        "n_punct": pc.count_substring_regex(text, PUNCT_RE),
        "n_digits": pc.count_substring_regex(text, DIGIT_RE),
        "n_upper": pc.count_substring_regex(text, UPPER_RE),
        "n_words": pc.count_substring_regex(text, WORD_RE),
    }


def quality_score_table(text: pa.ChunkedArray | pa.Array) -> dict[str, pa.Array]:
    """Heuristic quality signals in [0,1]: higher = more prose-like.

    Derived from the integer stats; float-valued, so exposed as a
    rows-only query (fp reductions are not hash-compared against SQL).
    """
    s = doc_stats_table(text)
    n_chars = pc.cast(s["n_chars2"], pa.float64())
    n_tokens = pc.cast(s["n_tokens"], pa.float64())
    safe_chars = pc.max_element_wise(n_chars, pa.scalar(1.0))
    safe_tokens = pc.max_element_wise(n_tokens, pa.scalar(1.0))
    alpha_ratio = pc.divide(pc.cast(pc.count_substring_regex(text, r"[a-zA-Z]"), pa.float64()), safe_chars)
    punct_ratio = pc.divide(pc.cast(s["n_punct"], pa.float64()), safe_tokens)
    digit_ratio = pc.divide(pc.cast(s["n_digits"], pa.float64()), safe_chars)
    mean_token_len = pc.divide(n_chars, safe_tokens)
    # prose-likeness: mostly alphabetic, some punctuation, few digits,
    # plausible mean token length (3..12 chars)
    len_ok = pc.and_(pc.greater_equal(mean_token_len, 3.0), pc.less_equal(mean_token_len, 12.0))
    score = pc.multiply(
        alpha_ratio,
        pc.multiply(
            pc.subtract(pa.scalar(1.0), pc.min_element_wise(digit_ratio, pa.scalar(1.0))),
            pc.add(pa.scalar(0.5), pc.multiply(pa.scalar(0.5), pc.cast(len_ok, pa.float64()))),
        ),
    )
    return {
        "alpha_ratio": alpha_ratio,
        "punct_ratio": punct_ratio,
        "digit_ratio": digit_ratio,
        "mean_token_len": mean_token_len,
        "quality_score": score,
    }
