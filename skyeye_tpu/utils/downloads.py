"""Weight download helpers (gated — this environment has zero network egress).

Capability parity (reference /root/reference/skyeye/utils/download.py:17-160):
retrying downloader chain, GitHub-release asset resolution with skyeye_{s,m,l}
fallbacks, `download_weights('s'|'m'|'l')`. Here the same API resolves local files
first and degrades gracefully offline: the chain is urllib -> curl, and failures
raise with a clear message instead of silently returning.
"""
from __future__ import annotations

import subprocess
from pathlib import Path
from typing import Optional

from .general import LOGGER, check_online

RELEASE_URL = "https://github.com/UmaimaKhan01/SkyEye-Aerial-Object-Detection-using-Yolo/releases/download/v1.0"
WEIGHT_FILES = {v: f"skyeye_{v}.pt" for v in ("s", "m", "l")}
DEFAULT_WEIGHTS_DIR = Path("weights")


def safe_download(url: str, dest, min_bytes: float = 1e5, retries: int = 3) -> Path:
    """Download url -> dest with a urllib -> curl fallback chain and size check."""
    dest = Path(dest)
    dest.parent.mkdir(parents=True, exist_ok=True)
    last_err: Optional[Exception] = None
    for attempt in range(retries):
        try:
            import urllib.request

            urllib.request.urlretrieve(url, dest)
            if dest.exists() and dest.stat().st_size > min_bytes:
                return dest
            raise IOError(f"downloaded file too small: {dest.stat().st_size} bytes")
        except Exception as e:
            last_err = e
            try:
                subprocess.run(
                    ["curl", "-L", "--fail", "--retry", "2", "-o", str(dest), url],
                    check=True, capture_output=True, timeout=300,
                )
                if dest.exists() and dest.stat().st_size > min_bytes:
                    return dest
            except Exception as e2:
                last_err = e2
        LOGGER.warning("download attempt %d/%d failed for %s", attempt + 1, retries, url)
    if dest.exists():
        dest.unlink()
    raise ConnectionError(f"failed to download {url}: {last_err}")


def attempt_download(file, repo_url: str = RELEASE_URL) -> str:
    """Resolve a weights path: existing local file wins; otherwise try the release
    assets (requires network). Reference attempt_download (download.py:67-112)."""
    file = str(file).strip()
    path = Path(file)
    if path.is_file():
        return str(path)
    name = path.name
    if name in WEIGHT_FILES.values():
        local = DEFAULT_WEIGHTS_DIR / name
        if local.is_file():
            return str(local)
        if not check_online():
            raise FileNotFoundError(
                f"{file} not found locally and no network egress is available; "
                f"place the file at {local} or pass an explicit path"
            )
        return str(safe_download(f"{repo_url}/{name}", local))
    raise FileNotFoundError(f"weights not found: {file}")


def download_weights(variant: str = "s", dest_dir=DEFAULT_WEIGHTS_DIR) -> str:
    """Fetch pretrained weights for a variant (reference download.py:115-160)."""
    if variant not in WEIGHT_FILES:
        raise ValueError(f"unknown variant {variant!r}; expected one of {list(WEIGHT_FILES)}")
    return attempt_download(Path(dest_dir) / WEIGHT_FILES[variant])
