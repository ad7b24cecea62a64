"""downloads module (reference utils/downloads.py): offline-capable paths —
URL parsing, zip round-trips, disk-space checks, local asset cache, loud
zero-egress errors."""
from pathlib import Path

import pytest

from yolo_contour_regression_tpu.utils.downloads import (
    attempt_download_asset,
    check_disk_space,
    clean_url,
    is_url,
    safe_download,
    unzip_file,
    url2file,
    zip_directory,
)


def test_is_url():
    assert is_url("https://example.com/a.zip")
    assert is_url("http://host/path?q=1")
    assert not is_url("/local/path/file.txt")
    assert not is_url("not a url")


def test_url2file_and_clean_url():
    assert url2file("https://host/dir/model.ckpt?auth=abc") == "model.ckpt"
    assert clean_url("https://host/dir/m.pt?x=1") == "https://host/dir/m.pt"


def test_zip_unzip_roundtrip_single_top(tmp_path):
    src = tmp_path / "data"
    (src / "sub").mkdir(parents=True)
    (src / "a.txt").write_text("alpha")
    (src / "sub" / "b.txt").write_text("beta")
    (src / ".DS_Store").write_text("junk")
    z = zip_directory(src)
    assert z == src.with_suffix(".zip") and z.exists()

    out = tmp_path / "out"
    out.mkdir()
    res = unzip_file(z, path=out)
    # multi-member archive without a single top dir -> extracted into <stem>/
    assert res == out / "data"
    assert (res / "a.txt").read_text() == "alpha"
    assert (res / "sub" / "b.txt").read_text() == "beta"
    assert not (res / ".DS_Store").exists()


def test_unzip_refuses_nonempty_without_exist_ok(tmp_path):
    src = tmp_path / "d"
    src.mkdir()
    (src / "f.txt").write_text("x")
    z = zip_directory(src)
    out = tmp_path / "tgt"
    (out / "d").mkdir(parents=True)
    (out / "d" / "pre").write_text("occupied")
    res = unzip_file(z, path=out)  # warns + returns without clobbering
    assert (res / "pre").exists()
    unzip_file(z, path=out, exist_ok=True)
    assert (out / "d" / "f.txt").exists()


def test_check_disk_space():
    assert check_disk_space(required_bytes=1)
    with pytest.raises(MemoryError):
        check_disk_space(required_bytes=1 << 50, hard=True)
    assert check_disk_space(required_bytes=1 << 50, hard=False) is False


def test_safe_download_local_passthrough(tmp_path):
    f = tmp_path / "weights.ckpt"
    f.write_bytes(b"x" * 10)
    assert safe_download(str(f), unzip=False) == f


def test_safe_download_asset_cache(tmp_path, monkeypatch):
    cache = tmp_path / "assets"
    cache.mkdir()
    (cache / "model.ckpt").write_bytes(b"y" * 10)
    monkeypatch.setenv("YCR_ASSETS_DIR", str(cache))
    got = safe_download("https://host/releases/model.ckpt",
                        dir=tmp_path / "dl", unzip=False)
    assert Path(got).read_bytes() == b"y" * 10


def test_safe_download_unzips(tmp_path):
    src = tmp_path / "pack"
    src.mkdir()
    (src / "inner.txt").write_text("z")
    z = zip_directory(src)
    res = safe_download(str(z), dir=tmp_path / "ext")
    assert (Path(res) / "inner.txt").read_text() == "z"


def test_attempt_download_asset_cache_and_miss(tmp_path, monkeypatch):
    cache = tmp_path / "assets"
    cache.mkdir()
    (cache / "yolov8n-seg.pt").write_bytes(b"w")
    monkeypatch.setenv("YCR_ASSETS_DIR", str(cache))
    assert attempt_download_asset("yolov8n-seg.pt") == str(cache / "yolov8n-seg.pt")
    with pytest.raises(FileNotFoundError, match="asset cache"):
        attempt_download_asset("not_an_asset.bin")


def test_zero_egress_loud_error(tmp_path, monkeypatch):
    """A download that cannot be satisfied raises ConnectionError naming the
    URL (no silent failure) — retries exercised against an unroutable host."""
    import urllib.request

    def boom(*a, **k):
        raise OSError("no egress")

    monkeypatch.setattr(urllib.request, "urlopen", boom)
    with pytest.raises(ConnectionError, match="download failure"):
        safe_download("https://host.invalid/file.zip", dir=tmp_path, retry=1)
