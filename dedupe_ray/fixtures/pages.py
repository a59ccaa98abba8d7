"""Deterministic synthetic Common-Crawl-style ``pages`` corpus with planted
near-duplicate clusters and labeled pairs (FIXTURES.md F1/F2/F6).

The web-text analog of the reference's ``testimages/cats`` conformance corpus
(one base cat image plus labeled transform variants — dark, greyscale,
distorted, upscaled, skewed, shrink, copy — with other cats as hard negatives;
/root/reference/README.md:9-14, :115-117). Image transforms map to text
transforms:

    copy            ↔ copy-of-kitten        (identical html)
    ws_jitter       ↔ brightness            (html differs, extracted text identical)
    case_jitter     ↔ greyscale             (text differs, token signature identical)
    token_edit      ↔ distortion/skew       (≤8% of tokens replaced)
    truncate        ↔ shrink                (last ~20% of paragraphs dropped)
    extend          ↔ upscale               (~15% extra paragraphs appended)
    boiler_swap     ↔ background/saturation (same body, different header/footer)

Hard negatives: pages sharing one heavy boilerplate template with distinct
bodies (the hot-LSH-bucket skew driver, F6) and near-threshold pairs with
~30% token edits. Everything is generated from one seeded ``default_rng`` —
no wall clock, no external data — so golden outputs are stable.

The ``text`` column is the ORACLE: it is composed directly from the source
parts (title/header/paragraphs/footer), NOT by running the extractor, so the
byte-identical invariant (``extract_text(html) == text``,
BASELINE.json:input_hint) is a real test of the extractor.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html import escape

import numpy as np
import pyarrow as pa

__all__ = ["generate_pages", "PAGES_SCHEMA", "PagesFixture"]

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

# A few entity-bearing / non-ASCII words so HTML escaping is exercised.
_SPECIAL_WORDS = ["r&d", "café", "naïve", "<beta>", "q&a", "über", "№42"]

_WS_RE = re.compile(r"\s+")


def _collapse(s: str) -> str:
    return _WS_RE.sub(" ", s).strip()


def _make_vocab(rng: np.random.Generator, size: int = 2000) -> list[str]:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    vocab = []
    for _ in range(size - len(_SPECIAL_WORDS)):
        ln = int(rng.integers(2, 11))
        vocab.append("".join(rng.choice(letters, size=ln)))
    vocab.extend(_SPECIAL_WORDS)
    return sorted(set(vocab))


@dataclass
class _Doc:
    title: str
    header: str
    paragraphs: list[list[str]]  # token lists
    footer: str

    def copy(self) -> "_Doc":
        return _Doc(self.title, self.header, [list(p) for p in self.paragraphs], self.footer)

    def tokens(self) -> list[str]:
        return [t for p in self.paragraphs for t in p]


@dataclass
class PagesFixture:
    pages: pa.Table
    labeled_pairs: pa.Table  # url_a, url_b, is_dup
    truth: pa.Table  # url, true_cluster(int64), transform(str)
    clusters: dict[int, list[str]] = field(default_factory=dict)


def _render_html(rng: np.random.Generator, doc: _Doc, ws_jitter: bool) -> bytes:
    def jitter(s: str) -> str:
        if not ws_jitter:
            return s
        out = []
        for w in s.split(" "):
            out.append(w)
            out.append("  " if rng.random() < 0.25 else " ")
        return "".join(out[:-1])

    parts = [
        "<!DOCTYPE html><html><head><meta charset=\"utf-8\">",
        f"<title>{escape(doc.title)}</title>",
        "<script type=\"text/javascript\">window.__consent = {ads: false};</script>",
        "<style>.main { margin: 0 auto; } p { line-height: 1.4; }</style>",
        "</head><body>",
        f"<header><nav>{escape(jitter(doc.header))}</nav></header>",
        "<!-- rendered by fixture generator -->",
        "<main>",
    ]
    for p in doc.paragraphs:
        parts.append(f"<p>{escape(jitter(' '.join(p)))}</p>")
    parts.append(f"</main><footer>{escape(jitter(doc.footer))}</footer></body></html>")
    return "".join(parts).encode("utf-8")


def _oracle_text(doc: _Doc) -> str:
    lines = [_collapse(doc.title), _collapse(doc.header)]
    lines.extend(_collapse(" ".join(p)) for p in doc.paragraphs)
    lines.append(_collapse(doc.footer))
    return "\n".join(ln for ln in lines if ln)


def _base_doc(rng: np.random.Generator, vocab: list[str], site: str,
              header: str | None = None, footer: str | None = None,
              n_tokens: tuple[int, int] = (120, 400)) -> _Doc:
    title = " ".join(rng.choice(vocab, size=int(rng.integers(3, 7))))
    header = header if header is not None else f"{site} home articles about contact"
    footer = footer if footer is not None else f"© 2024 {site} all rights reserved"
    total = int(rng.integers(*n_tokens))
    paragraphs: list[list[str]] = []
    left = total
    while left > 0:
        n = int(min(left, rng.integers(15, 45)))
        paragraphs.append(list(rng.choice(vocab, size=n)))
        left -= n
    return _Doc(title, header, paragraphs, footer)


def _edit_tokens(rng: np.random.Generator, doc: _Doc, vocab: list[str], frac: float) -> None:
    toks = doc.tokens()
    n_edit = max(1, int(len(toks) * frac))
    flat_pos = rng.choice(len(toks), size=n_edit, replace=False)
    flat_set = set(int(i) for i in flat_pos)
    i = 0
    for p in doc.paragraphs:
        for j in range(len(p)):
            if i in flat_set:
                p[j] = str(rng.choice(vocab))
            i += 1


_TRANSFORMS = ["copy", "ws_jitter", "case_jitter", "token_edit", "truncate", "extend", "boiler_swap"]


def generate_pages(
    n_pages: int = 500,
    seed: int = 42,
    dup_frac: float = 0.4,
    skew_frac: float = 0.10,
    near_negative_frac: float = 0.03,
    easy_negative_pairs: int = 2000,
) -> PagesFixture:
    """Generate ``n_pages`` pages. ~``dup_frac`` of rows sit in planted
    clusters of size 2-8; ``skew_frac`` of rows share one heavy boilerplate
    (hot-bucket driver, must NOT merge); ``near_negative_frac`` of rows are
    near-threshold negatives (~30% edits of some base)."""
    rng = np.random.default_rng(seed)
    vocab = _make_vocab(rng)
    hot_header = (
        "megaportal navigation " + " ".join(rng.choice(vocab, size=30))
    )
    hot_footer = "megaportal legal " + " ".join(rng.choice(vocab, size=25))

    rows: list[dict] = []  # url, doc, ws_jitter, cluster, transform, lang
    cluster_id = 0
    pair_pos: list[tuple[str, str]] = []
    pair_neg: list[tuple[str, str]] = []
    clusters: dict[int, list[str]] = {}

    def add_row(doc: _Doc, cluster: int, transform: str, ws: bool = False, lang: str = "en"):
        i = len(rows)
        site = f"site-{cluster:05d}"
        url = f"https://{site}.example/{transform}-{i}"
        rows.append(
            dict(url=url, doc=doc, ws=ws, cluster=cluster, transform=transform, lang=lang)
        )
        clusters.setdefault(cluster, []).append(url)
        return url

    n_skew = int(n_pages * skew_frac)
    n_near_pairs = max(1, int(n_pages * near_negative_frac) // 2)
    n_dup_rows = int(n_pages * dup_frac)

    # --- planted clusters ---------------------------------------------------
    made = 0
    while n_dup_rows - made >= 2:
        size = min(int(rng.integers(2, 9)), n_dup_rows - made)
        site = f"site-{cluster_id:05d}"
        base = _base_doc(rng, vocab, site)
        urls = [add_row(base, cluster_id, "base")]
        for _ in range(size - 1):
            t = _TRANSFORMS[int(rng.integers(0, len(_TRANSFORMS)))]
            v = base.copy()
            ws = False
            if t == "copy":
                pass
            elif t == "ws_jitter":
                ws = True
            elif t == "case_jitter":
                for p in v.paragraphs:
                    for j in range(len(p)):
                        if rng.random() < 0.15:
                            p[j] = p[j].upper()
            elif t == "token_edit":
                _edit_tokens(rng, v, vocab, float(rng.uniform(0.02, 0.08)))
            elif t == "truncate":
                keep = max(1, int(len(v.paragraphs) * 0.8))
                v.paragraphs = v.paragraphs[:keep]
            elif t == "extend":
                extra = max(1, int(len(v.paragraphs) * 0.15))
                for _ in range(extra):
                    v.paragraphs.append(list(rng.choice(vocab, size=int(rng.integers(15, 45)))))
            elif t == "boiler_swap":
                v.header = f"{site} start blog archive impressum"
                v.footer = f"{site} privacy terms newsletter"
            urls.append(add_row(v, cluster_id, t, ws=ws))
        for a in range(len(urls)):
            for b in range(a + 1, len(urls)):
                pair_pos.append((urls[a], urls[b]))
        made += len(urls)
        cluster_id += 1

    # --- hot-boilerplate hard negatives (F6) --------------------------------
    skew_urls = []
    for _ in range(n_skew):
        site = f"site-{cluster_id:05d}"
        doc = _base_doc(rng, vocab, site, header=hot_header, footer=hot_footer,
                        n_tokens=(150, 350))
        skew_urls.append(add_row(doc, cluster_id, "hot_boiler"))
        cluster_id += 1
    for i in range(min(len(skew_urls), 200)):
        j = int(rng.integers(0, len(skew_urls)))
        if j != i:
            pair_neg.append((skew_urls[i], skew_urls[j]))

    # --- near-threshold negatives ------------------------------------------
    for _ in range(n_near_pairs):
        site = f"site-{cluster_id:05d}"
        base = _base_doc(rng, vocab, site)
        u1 = add_row(base, cluster_id, "near_base")
        cluster_id += 1
        v = base.copy()
        _edit_tokens(rng, v, vocab, 0.30)
        u2 = add_row(v, cluster_id, "near_neg")
        cluster_id += 1
        pair_neg.append((u1, u2))

    # --- singletons (fill to exactly n_pages) -------------------------------
    langs = ["en"] * 46 + ["de"] * 2 + ["fr"] * 2
    for _ in range(max(0, n_pages - len(rows))):
        site = f"site-{cluster_id:05d}"
        lang = langs[int(rng.integers(0, len(langs)))]
        doc = _base_doc(rng, vocab, site)
        add_row(doc, cluster_id, "singleton", lang=lang)
        cluster_id += 1

    # --- easy negatives sample ---------------------------------------------
    n = len(rows)
    url_by_idx = [r["url"] for r in rows]
    cl_by_idx = [r["cluster"] for r in rows]
    for _ in range(easy_negative_pairs):
        i, j = int(rng.integers(0, n)), int(rng.integers(0, n))
        if i != j and cl_by_idx[i] != cl_by_idx[j]:
            a, b = sorted((url_by_idx[i], url_by_idx[j]))
            pair_neg.append((a, b))

    # --- materialize Arrow tables ------------------------------------------
    htmls, texts = [], []
    for r in rows:
        htmls.append(_render_html(rng, r["doc"], r["ws"]))
        texts.append(_oracle_text(r["doc"]))
    ts = [(_EPOCH_US + i * 1_000_000 + int(rng.integers(0, 1000))) for i in range(n)]
    pages = pa.table(
        {
            "url": pa.array(url_by_idx, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        },
        schema=PAGES_SCHEMA,
    )
    seen = set()
    pl: list[tuple[str, str, bool]] = []
    for a, b in pair_pos:
        a, b = min(a, b), max(a, b)
        if (a, b) not in seen:
            seen.add((a, b))
            pl.append((a, b, True))
    for a, b in pair_neg:
        a, b = min(a, b), max(a, b)
        if (a, b) not in seen:
            seen.add((a, b))
            pl.append((a, b, False))
    labeled = pa.table(
        {
            "url_a": pa.array([p[0] for p in pl], pa.string()),
            "url_b": pa.array([p[1] for p in pl], pa.string()),
            "is_dup": pa.array([p[2] for p in pl], pa.bool_()),
        }
    )
    truth = pa.table(
        {
            "url": pa.array(url_by_idx, pa.string()),
            "true_cluster": pa.array(cl_by_idx, pa.int64()),
            "transform": pa.array([r["transform"] for r in rows], pa.string()),
        }
    )
    return PagesFixture(pages=pages, labeled_pairs=labeled, truth=truth, clusters=clusters)
