"""BEIR dataset download + cache staging.

The reference harness pulls BEIR zips on demand (reference
benchmarks/hybrid_beir.py:125); this module is the counterpart, kept
separate so the no-egress environment can still unit-test the full
path with ``file://`` URLs. Zips extract to
``<cache_dir>/<name>/`` holding the corpus.jsonl / queries.jsonl /
qrels/test.tsv layout that ``benchmarks.utils.load_beir_dataset``
consumes — so ``--download scifact`` is exactly
``--data-dir <cache>/scifact`` with the fetch automated.
"""

from __future__ import annotations

import os
import urllib.error
import urllib.request
import zipfile

BEIR_BASE_URL = (
    "https://public.ukp.informatik.tu-darmstadt.de/thakur/BEIR/datasets/"
    "{name}.zip"
)


def _find_dataset_root(extract_dir: str, name: str) -> str:
    """The directory holding corpus.jsonl (zips nest it under <name>/)."""
    direct = os.path.join(extract_dir, name)
    for candidate in (direct, extract_dir):
        if os.path.exists(os.path.join(candidate, "corpus.jsonl")):
            return candidate
    for root, _dirs, files in os.walk(extract_dir):
        if "corpus.jsonl" in files:
            return root
    raise FileNotFoundError(
        f"no corpus.jsonl found under {extract_dir} after extracting "
        f"{name}.zip — not a BEIR-format archive?")


def download_beir(name: str, cache_dir: str,
                  base_url: str = BEIR_BASE_URL) -> str:
    """Fetch + extract a BEIR dataset into the cache; returns the
    directory to pass to ``load_beir_dataset``. Idempotent: an already
    extracted dataset is returned without touching the network, so the
    cache survives offline runs. ``base_url`` accepts any
    ``{name}``-templated URL, including ``file://`` (used by tests)."""
    cache_dir = os.path.expanduser(cache_dir)
    os.makedirs(cache_dir, exist_ok=True)
    extract_dir = os.path.join(cache_dir, f"{name}__extracted")
    marker = os.path.join(extract_dir, ".complete")
    if os.path.exists(marker):
        return _find_dataset_root(extract_dir, name)

    zip_path = os.path.join(cache_dir, f"{name}.zip")
    if not os.path.exists(zip_path):
        url = base_url.format(name=name)
        tmp = zip_path + ".part"
        try:
            urllib.request.urlretrieve(url, tmp)
        except (urllib.error.URLError, OSError) as exc:
            raise RuntimeError(
                f"could not download {url!r}: {exc}. If this environment "
                f"has no egress, fetch the zip elsewhere and drop it at "
                f"{zip_path!r} (the loader picks it up without a network "
                f"call).") from exc
        os.replace(tmp, zip_path)

    os.makedirs(extract_dir, exist_ok=True)
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(extract_dir)
    root = _find_dataset_root(extract_dir, name)
    with open(marker, "w") as f:
        f.write("ok\n")
    return root
