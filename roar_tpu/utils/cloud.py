"""Pretrained-artifact download + cache.

Re-design of roar/utils/cloud.py (maybe_download_from_cloud :12, NGC/
wget machinery :87): a cache keyed by (subfolder, filename) under
ROAR_CACHE_DIR, with local-path and file:// sources always available and
HTTP(S) via urllib when the environment has egress (this build environment
does not — the gated path keeps API parity without a hard dependency).
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path
from typing import Optional

from roar_tpu.utils.logging import get_logger

logging = get_logger()


def get_cache_dir() -> Path:
    """ROAR_CACHE_DIR or ~/.cache/roar_tpu (constants.py ROAR_CACHE_DIR)."""
    override = os.environ.get("ROAR_CACHE_DIR")
    if override:
        return Path(override)
    return Path.home() / ".cache" / "roar_tpu"


def maybe_download_from_cloud(
    url: str,
    filename: str,
    subfolder: Optional[str] = None,
    cache_dir: Optional[str] = None,
    refresh_cache: bool = False,
) -> str:
    """Return a local path for `url`/`filename`, downloading/copying into
    the cache unless already present (roar/utils/cloud.py:12-85 semantics:
    empty-string return on failure, refresh_cache forces re-fetch)."""
    cache = Path(cache_dir) if cache_dir else get_cache_dir()
    if subfolder:
        cache = cache / subfolder
    cache.mkdir(parents=True, exist_ok=True)
    dest = cache / filename

    if dest.exists() and not refresh_cache:
        return str(dest)
    if dest.exists():
        dest.unlink()

    source = url + filename if url.endswith("/") else url
    try:
        if source.startswith("file://"):
            shutil.copyfile(source[len("file://"):], dest)
        elif source.startswith(("http://", "https://")):
            import urllib.request  # gated: zero-egress envs will fail here

            urllib.request.urlretrieve(source, dest)  # noqa: S310
        else:  # plain local path
            shutil.copyfile(source, dest)
    except Exception as exc:
        logging.warning(f"Could not fetch {source}: {exc}")
        if dest.exists():
            dest.unlink()
        return ""
    logging.info(f"Fetched {source} -> {dest}")
    return str(dest)
