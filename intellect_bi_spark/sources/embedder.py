"""Embedding stage (SURVEY §2.11 R4) as an Arrow-batched ``mapInPandas``.

The reference embeds chunk batches over HTTP with retry×4 and
1.5·attempt backoff (api/ollama_embedder.py:28-44, batch=16
etl/index_docs.py:102). Spark-first: the embedder is a per-batch callable
inside ``mapInPandas`` — executors fan batches out in parallel, Arrow moves
the text in/vectors out, and the HTTP client exists per-task (no driver
bottleneck, no serialized session).

No embedding service exists in this container, so the remote path is
STUBBED (same signature, raises unless an endpoint is configured) and the
default is a deterministic local embedder: dim-seeded polynomial char
hashes scaled to [-0.5, 0.5). That keeps the pipeline end-to-end testable
and the vectors stable across engines/runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

EMBED_DIM = 64
EMBED_RETRIES = 4  # reference api/ollama_embedder.py:4-6
EMBED_BACKOFF_S = 1.5
_P = 1_000_000_007


def local_embed_texts(texts: list[str], dim: int = EMBED_DIM) -> np.ndarray:
    """Deterministic fallback embedder: v[d] = polyhash(text, seed=31+d)
    scaled into [-0.5, 0.5). Pure integer arithmetic — reproducible
    anywhere."""
    out = np.empty((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        codes = np.frombuffer(t.encode("utf-8", "replace"), dtype=np.uint8)
        for d in range(dim):
            acc = 0
            mult = 31 + d
            for c in codes.tolist():
                acc = (acc * mult + int(c)) % _P
            out[i, d] = acc / _P - 0.5
    return out


def remote_embed_texts(
    texts: list[str], endpoint: str | None = None
) -> np.ndarray:  # pragma: no cover - no embedding service in container
    """Remote path with the reference's retry/backoff contract
    (api/ollama_embedder.py:28-44). STUB: raises without an endpoint."""
    if not endpoint:
        raise NotImplementedError(
            "no embedding endpoint configured; use local_embed_texts"
        )
    import time
    import urllib.request

    last: Exception | None = None
    for attempt in range(1, EMBED_RETRIES + 1):
        try:
            import json

            req = urllib.request.Request(
                endpoint,
                data=json.dumps({"input": texts}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=180) as resp:
                return np.asarray(
                    json.loads(resp.read())["embeddings"], dtype=np.float32
                )
        except Exception as exc:  # noqa: BLE001 - retry contract
            last = exc
            time.sleep(EMBED_BACKOFF_S * attempt)
    raise RuntimeError(f"embedding failed after {EMBED_RETRIES} retries: {last}")


def embed_chunks(
    df: DataFrame,
    text_col: str = "chunk",
    id_col: str = "chunk_id",
    dim: int = EMBED_DIM,
    endpoint: str | None = None,
) -> DataFrame:
    """(id, text) → (id, embedding array<float>) via mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            texts = batch[text_col].tolist()
            vecs = (
                remote_embed_texts(texts, endpoint)
                if endpoint
                else local_embed_texts(texts, dim)
            )
            yield pd.DataFrame(
                {id_col: batch[id_col], "embedding": list(map(list, vecs))}
            )

    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} string, embedding array<float>"
    )
