"""Multimodal (image/audio/video) column plumbing — decode stages as actor
pools over opaque ``binary`` payload columns.

The reference decodes images via Go's stdlib registry
(/root/reference/utils/file.go:6-23). This container has no image/audio
codecs, so the DECODE KERNEL is stubbed (clearly marked), but everything
Ray-side is real and tested: schema handling, actor-pool signature, batch
sizing for large binary payloads, deterministic fake features for tests,
and the failure policy (malformed payload → quarantine row, job continues —
the drop-and-continue semantics of /root/reference/dedupe.go:55-58).

Real deployments swap ``_decode_payload`` for PIL/ffmpeg and keep the rest.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = ["MEDIA_SCHEMA", "MediaFeatureStage"]

# media records: opaque payload + typed metadata (SURVEY: treat image/audio/
# video as opaque binary with typed metadata)
MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("url", pa.string()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


class MediaFeatureStage:
    """map_batches actor: payload → fixed-width feature vector + ok flag.

    ``mode="fake"`` (default, test mode) derives a deterministic
    pseudo-feature vector from a blake2b hash of the payload — stable across
    runs, exercises the full Arrow plumbing. ``mode="real"`` is the
    integration point for an actual codec and raises ``NotImplementedError``
    in this sealed environment (STUB — no image/audio libraries available).

    Large binary payloads need SMALL batch sizes: batch_size × payload ×
    concurrency must fit the worker heap — callers pass e.g.
    ``batch_size=64`` for multi-MB payloads.
    """

    FEATURE_DIM = 64

    def __init__(self, mode: str = "fake"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode

    def _decode_payload(self, payload: bytes, media_type: str) -> np.ndarray:
        if self.mode == "real":
            # STUB: no codecs in this container. Swap in PIL / torchaudio /
            # ffmpeg here; must return a float32 vector of FEATURE_DIM.
            raise NotImplementedError("real media decoding requires codec libraries")
        digest = hashlib.blake2b(payload, digest_size=self.FEATURE_DIM).digest()
        return (np.frombuffer(digest, dtype=np.uint8).astype(np.float32) - 127.5) / 127.5

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        media_types = batch.column("media_type").to_pylist()
        feats = np.zeros((len(payloads), self.FEATURE_DIM), dtype=np.float32)
        ok = np.zeros(len(payloads), dtype=bool)
        for i, (p, mt) in enumerate(zip(payloads, media_types)):
            if p is None or len(p) == 0:
                continue  # quarantined: ok stays False, row survives
            try:
                feats[i] = self._decode_payload(p, mt)
                ok[i] = True
            except NotImplementedError:
                raise
            except Exception:
                ok[i] = False
        out = batch.drop_columns(["payload"])  # don't carry payloads downstream
        out = out.append_column(
            "features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1), pa.float32()), self.FEATURE_DIM
            ),
        )
        return out.append_column("decode_ok", pa.array(ok, pa.bool_()))
