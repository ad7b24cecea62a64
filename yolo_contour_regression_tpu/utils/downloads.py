"""Download + asset utilities (reference utils/downloads.py).

Zero-egress-aware rebuild: every network-touching path goes through
``safe_download``, which resolves local files / the local asset cache first
and only then opens a socket (urllib, retry loop). In an egress-blocked
image the offline paths (zip/unzip, disk-space checks, URL parsing, cache
lookup) work fully, and a genuine download failure raises a loud
ConnectionError naming the URL — same contract as the reference
(downloads.py:210-296).

Asset cache: ``attempt_download_asset`` (reference downloads.py:312) looks in
``$YCR_ASSETS_DIR``, ``~/.ycr_assets`` and the CWD before trying the network,
so pre-seeded images work without egress.
"""
from __future__ import annotations

import os
import re
import shutil
import urllib.parse
import urllib.request
from pathlib import Path
from zipfile import ZIP_DEFLATED, ZipFile, is_zipfile

from . import LOGGER

# canonical asset names (reference downloads.py:18-26), .ckpt for this repo's
# native serialization alongside the reference's .pt stems
GITHUB_ASSET_NAMES = (
    [f"yolov8{k}{s}.pt" for k in "nsmlx" for s in ("", "-cls", "-seg", "-pose")]
    + [f"yolov5{k}u.pt" for k in "nsmlx"]
    + [f"yolo_nas_{k}.pt" for k in "sml"]
    + [f"sam_{k}.pt" for k in "bl"]
    + ["mobile_sam.pt", "rtdetr-l.pt", "rtdetr-x.pt"]
)
GITHUB_ASSET_STEMS = [Path(k).stem for k in GITHUB_ASSET_NAMES]


def is_url(url, check: bool = False) -> bool:
    """True if the string parses as a URL; with ``check=True`` also opens it
    (network!) like the reference's is_url(check=True)."""
    try:
        url = str(url)
        result = urllib.parse.urlparse(url)
        if not (result.scheme and result.netloc):
            return False
        if check:
            with urllib.request.urlopen(url) as response:
                return response.getcode() == 200
        return True
    except Exception:
        return False


def url2file(url: str) -> str:
    """URL -> filename, query-string stripped (reference clean_url/url2file)."""
    return Path(clean_url(url)).name


def clean_url(url: str) -> str:
    """Strip auth/query from a URL for display and filename derivation."""
    url = Path(str(url)).as_posix().replace(":/", "://")
    return urllib.parse.unquote(url).split("?")[0]


def zip_directory(directory, compress: bool = True,
                  exclude=(".DS_Store", "__MACOSX"), progress: bool = True) -> Path:
    """Zip a directory's contents into <dir>.zip, excluding junk entries
    (reference downloads.py:42)."""
    directory = Path(directory)
    if not directory.is_dir():
        raise FileNotFoundError(f"Directory '{directory}' does not exist.")
    files = [
        f for f in directory.rglob("*")
        if f.is_file() and all(x not in f.name for x in exclude)
    ]
    zip_path = directory.with_suffix(".zip")
    compression = ZIP_DEFLATED if compress else 0
    with ZipFile(zip_path, "w", compression) as zf:
        for f in files:
            zf.write(f, f.relative_to(directory))
    return zip_path


def unzip_file(file, path=None, exclude=(".DS_Store", "__MACOSX"),
               exist_ok: bool = False, progress: bool = True) -> Path:
    """Unzip to ``path``; when the archive has no single top-level directory,
    extract into a directory named after the zip (reference downloads.py:80).
    Refuses to clobber a non-empty existing target unless exist_ok."""
    file = Path(file)
    if not (file.exists() and is_zipfile(file)):
        raise FileNotFoundError(f"'{file}' does not exist or is not a zipfile.")
    path = Path(path or file.parent)
    with ZipFile(file) as zf:
        names = [n for n in zf.namelist() if all(x not in n for x in exclude)]
        top = {n.split("/")[0] for n in names}
        one_dir = len(top) == 1 and all(
            "/" in n or n.endswith("/") for n in names
        )
        if one_dir:  # archive already wraps everything in one directory
            extract_path = path
            path = path / next(iter(top))
        else:  # files at archive root -> extract into <stem>/
            path = extract_path = path / file.stem
        if path.exists() and any(path.iterdir()) and not exist_ok:
            LOGGER.warning(f"skipping {file} unzip: {path} is not empty")
            return path
        for n in names:
            if ".." in Path(n).parts:
                LOGGER.warning(f"skipping unsafe zip member {n}")
                continue
            zf.extract(n, extract_path)
    return path


def check_disk_space(url: str = "", sf: float = 1.5, hard: bool = True,
                     required_bytes: int = 2 << 30) -> bool:
    """Check free disk space covers ``required_bytes * sf`` (reference
    downloads.py:136 checks Content-Length; offline callers pass the size)."""
    if url and is_url(url):
        try:
            with urllib.request.urlopen(url) as r:  # pragma: no cover (egress)
                required_bytes = int(r.headers.get("Content-Length", 0)) or required_bytes
        except Exception:
            pass
    free = shutil.disk_usage(Path.cwd()).free
    if free > required_bytes * sf:
        return True
    msg = (
        f"insufficient disk space: need {required_bytes * sf / (1 << 30):.1f} GB "
        f"(x{sf} safety factor), have {free / (1 << 30):.1f} GB free"
    )
    if hard:
        raise MemoryError(msg)
    LOGGER.warning(msg)
    return False


def _asset_cache_dirs():
    env = os.environ.get("YCR_ASSETS_DIR")
    dirs = [Path(env)] if env else []
    return dirs + [Path.home() / ".ycr_assets", Path.cwd()]


def safe_download(url, file=None, dir=None, unzip: bool = True,
                  delete: bool = False, retry: int = 3, min_bytes: float = 1.0,
                  progress: bool = True):
    """Resolve/download ``url`` to a local file with retries + optional unzip
    (reference downloads.py:210). Resolution order: local path -> asset
    cache -> network (urllib, ``retry`` attempts). Raises ConnectionError
    with the URL on failure so zero-egress environments fail loudly."""
    f = Path(dir) / (file or url2file(url)) if dir else Path(file or url2file(url))
    if "://" not in str(url) and Path(url).is_file():
        f = Path(url)
    elif not f.is_file():
        for cache in _asset_cache_dirs():
            hit = cache / f.name
            if hit.is_file():
                LOGGER.info(f"found {f.name} in local asset cache {cache}")
                f = hit
                break
    if not f.is_file():
        desc = f"downloading {clean_url(url)} to '{f}'"
        LOGGER.info(desc)
        f.parent.mkdir(parents=True, exist_ok=True)
        err = None
        for i in range(retry + 1):
            try:
                with urllib.request.urlopen(str(url)) as r, open(f, "wb") as out:
                    shutil.copyfileobj(r, out)
                if f.exists() and f.stat().st_size > min_bytes:
                    break
                f.unlink(missing_ok=True)
            except Exception as e:
                err = e
                if i >= retry:
                    raise ConnectionError(
                        f"download failure for {clean_url(url)} after "
                        f"{retry} retries (zero-egress image? pre-seed the "
                        f"file into $YCR_ASSETS_DIR or ~/.ycr_assets)"
                    ) from err
                LOGGER.warning(f"download failure, retrying {i + 1}/{retry} {url}")
        if not f.is_file():
            # every attempt returned an undersized body (captive portal /
            # empty 200) without raising — still a failure, fail loudly
            raise ConnectionError(
                f"download failure for {clean_url(url)}: all {retry + 1} "
                f"attempts returned < {min_bytes} bytes (zero-egress image? "
                f"pre-seed the file into $YCR_ASSETS_DIR or ~/.ycr_assets)"
            )

    if unzip and f.exists() and f.suffix in ("", ".zip", ".tar", ".gz"):
        unzip_dir = Path(dir or f.parent)
        if is_zipfile(f):
            unzip_dir = unzip_file(file=f, path=unzip_dir)
        elif f.suffix in (".tar", ".gz"):
            import subprocess

            LOGGER.info(f"unzipping {f} to {unzip_dir.resolve()}")
            subprocess.run(
                ["tar", "xf" if f.suffix == ".tar" else "xfz", str(f),
                 "--directory", str(unzip_dir)],
                check=True,
            )
        if delete:
            f.unlink()
        return unzip_dir
    return f


def attempt_download_asset(file, repo: str = "ultralytics/assets",
                           release: str = "v0.0.0") -> str:
    """Resolve a named asset: existing path -> local asset cache -> GitHub
    release URL via safe_download (reference downloads.py:312)."""
    file = str(file).strip().replace("'", "")
    f = Path(file)
    if f.exists():
        return str(f)
    for cache in _asset_cache_dirs():
        hit = cache / f.name
        if hit.is_file():
            return str(hit)
    if f.name in GITHUB_ASSET_NAMES or f.stem in GITHUB_ASSET_STEMS:
        url = f"https://github.com/{repo}/releases/download/{release}/{f.name}"
        return str(safe_download(url, file=str(f), unzip=False))
    raise FileNotFoundError(
        f"asset '{file}' not found locally, not in the asset cache "
        f"({[str(d) for d in _asset_cache_dirs()]}), and not a known "
        f"release asset"
    )


def download(url, dir=Path.cwd(), unzip: bool = True, delete: bool = False,
             threads: int = 1, retry: int = 3):
    """Concurrent multi-URL front end over safe_download (reference
    downloads.py:356)."""
    dir = Path(dir)
    dir.mkdir(parents=True, exist_ok=True)
    urls = [url] if isinstance(url, (str, Path)) else list(url)
    if threads > 1:
        from multiprocessing.pool import ThreadPool

        with ThreadPool(threads) as pool:
            pool.map(
                lambda u: safe_download(u, dir=dir, unzip=unzip, delete=delete, retry=retry),
                urls,
            )
    else:
        for u in urls:
            safe_download(u, dir=dir, unzip=unzip, delete=delete, retry=retry)
