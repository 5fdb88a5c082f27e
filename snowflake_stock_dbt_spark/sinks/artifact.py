"""Shared core of the index-as-artifact family (round-11 VERDICT item 6).

Every persisted lake artifact in this package — the IVF/PQ quantizer
state (ann_index), the MinHash band index (band_index), the SimHash
slice index (simhash_index), the pHash band index (phash_index), the
HLL register store (sketch_store) and the per-modality curation
verdicts (verdict_store) — shares one publish/load contract:

- **staged-rename publish**: payload parquet + ``_META.json`` are fully
  written into a ``{path}.tmp.{pid}`` staging dir, then promoted with a
  single driver-local rename, so a reader can never observe
  parquet-without-meta (a torn artifact);
- **session save memo**: sweep/bench re-runs of a registered query
  reuse the artifact instead of re-shuffling the payload every call;
- **meta-gated load**: a missing artifact raises FileNotFoundError
  naming the producer; a family-mismatched one (different hash family /
  signature geometry / modality set) raises ValueError instead of
  silently matching nothing — the worst failure mode for a dedup gate.

The stores previously hand-rolled these three behaviors each; this
module is the one implementation they now delegate to, so the
family-mismatch and staleness tests pin shared code.

100 TB posture note: the rename-based publish assumes a filesystem with
atomic directory rename (local disk, HDFS). An object-store deployment
would swap _publish_atomically for a manifest-pointer flip — the one
seam to change, in one place.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from typing import Callable

#: Session-scoped save memo (path -> meta) shared by every store: paths
#: are namespaced per store root, so one registry serves all families.
_SAVED: dict[str, dict] = {}


def artifact_path(root: str, sf_dir: str) -> str:
    """Deterministic scratch location for a corpus's artifact under
    ``root``, keyed on a hash of the FULL corpus path (not just the
    basename), so two corpora that happen to share a directory name
    never collide on the same artifact (round-7 ADVICE)."""
    norm = os.path.abspath(os.path.normpath(sf_dir))
    tag = os.path.basename(norm) or "corpus"
    digest = hashlib.sha256(norm.encode()).hexdigest()[:12]
    return f"{root}/{tag}-{digest}"


def _publish_atomically(tmp_path: str, path: str) -> None:
    """Promote a fully-written staging dir to the final artifact path
    with a single driver-local rename (meta already inside, so a reader
    can never observe parquet-without-meta). A stale artifact from an
    earlier process is evicted first; if a CONCURRENT writer wins the
    final rename, ours is discarded and theirs is used — same corpus,
    same deterministic training, and the loaded-equals-trained parity
    check downstream raises loudly on any real drift."""
    try:
        os.rename(tmp_path, path)
        return
    except OSError:
        shutil.rmtree(path, ignore_errors=True)
    try:
        os.rename(tmp_path, path)
    except OSError:
        shutil.rmtree(tmp_path, ignore_errors=True)
        if not os.path.exists(os.path.join(path, "_META.json")):
            raise


def publish_artifact(
    path: str,
    write_payload: Callable[[str], dict | None],
    info: dict,
) -> dict:
    """The shared publish: stage, write payload tables via
    ``write_payload(tmp_dir)`` (whatever dict it returns is folded into
    the meta — e.g. counted rows), dump ``_META.json``, rename, memo.
    Idempotent per session; returns the written meta."""
    cached = _SAVED.get(path)
    if cached is not None:
        return cached
    tmp = f"{path}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    extra = write_payload(tmp) or {}
    meta = {**extra, **info}
    with open(f"{tmp}/_META.json", "w") as f:
        json.dump(meta, f)
    _publish_atomically(tmp, path)
    _SAVED[path] = meta
    return meta


def load_artifact_meta(path: str, kind: str, producer: str) -> dict:
    """Read ``_META.json`` or raise FileNotFoundError naming the
    producer function — the 'how to make one' hint the q347/q329 load
    discipline requires."""
    meta_path = os.path.join(path, "_META.json")
    if not os.path.exists(meta_path):
        raise FileNotFoundError(
            f"no {kind} artifact at {path} (expected _META.json; run "
            f"{producer} first)"
        )
    with open(meta_path) as f:
        return json.load(f)


def require_family(
    path: str,
    meta: dict,
    want: dict,
    kind: str,
    family_noun: str = "family",
) -> None:
    """Loud raise when the artifact's recorded family doesn't match what
    this session's probe expects — probing with the wrong family would
    silently match nothing."""
    got = {key: meta.get(key) for key in want}
    if got != want:
        raise ValueError(
            f"{kind} at {path} was built with {family_noun} {got}, this "
            f"probe expects {want} — refusing a family-mismatched load"
        )
