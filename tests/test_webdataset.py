"""WebDataset tar shard export (io.py): member layout + pinned
metadata, (shuffle_key, id) ordering vs plain-Python replay,
byte-identical re-export, manifest verify + tamper detection, NULL
member skip."""

import hashlib
import io as pyio
import os
import tarfile

import pytest

from electrician_spark import multimodal as mm
from electrician_spark.io import verify_webdataset_shards, write_webdataset_shards


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (
            i,
            bytearray(mm.synth_png_gray(4, 4, i * 9 % 251)),
            f'{{"id": {i}}}',
            f"caption {i}" if i % 5 else None,  # some NULL captions
        )
        for i in range(40)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, payload binary, meta string, caption string"
    )


def _export(spark, media_df, tmp, seed=1):
    return write_webdataset_shards(
        media_df,
        tmp,
        n_shards=4,
        members={"png": "payload", "json": "meta", "txt": "caption"},
        seed=seed,
    )


def _key(seed, i):
    return int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16)


def test_webdataset_layout_and_order(spark, media_df, tmp_path):
    out = str(tmp_path / "wds")
    manifest = _export(spark, media_df, out).collect()
    assert sum(r["samples"] for r in manifest) == 40
    # python replay of membership + order
    by_shard = {}
    for i in range(40):
        k = _key(1, i)
        by_shard.setdefault((k * 4) >> 32, []).append((k, i))
    for r in manifest:
        want = sorted(by_shard[r["shard"]])
        with tarfile.open(os.path.join(out, r["file"])) as tar:
            members = tar.getmembers()
            stems = []
            for m in members:
                stem = m.name.rsplit(".", 1)[0]
                if stem not in stems:
                    stems.append(stem)
                # pinned metadata for byte-reproducibility
                assert m.mtime == 0 and m.uid == 0 and m.mode == 0o644
            assert stems == [f"{k:010d}_{i}" for k, i in want]
            # member contents round-trip; NULL captions are absent
            for k, i in want:
                stem = f"{k:010d}_{i}"
                png = tar.extractfile(f"{stem}.png").read()
                assert png == mm.synth_png_gray(4, 4, i * 9 % 251)
                meta = tar.extractfile(f"{stem}.json").read().decode()
                assert meta == f'{{"id": {i}}}'
                names = tar.getnames()
                assert (f"{stem}.txt" in names) == bool(i % 5)


def test_webdataset_reexport_byte_identical(spark, media_df, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    ma = {r["file"]: r["sha256"] for r in _export(spark, media_df, a).collect()}
    mb = {r["file"]: r["sha256"] for r in _export(spark, media_df, b).collect()}
    assert ma == mb
    for f, sha in ma.items():
        raw = open(os.path.join(a, f), "rb").read()
        assert hashlib.sha256(raw).hexdigest() == sha
    # different seed → different permutation
    mc = {
        r["file"]: r["sha256"]
        for r in _export(spark, media_df, str(tmp_path / "c"), seed=2).collect()
    }
    assert mc != ma


def test_webdataset_verify_and_tamper(spark, media_df, tmp_path):
    out = str(tmp_path / "v")
    _export(spark, media_df, out)
    ok = verify_webdataset_shards(spark, out)
    rows = ok.collect()
    assert rows and all(r["ok"] for r in rows)
    # flip one byte inside a tar member region
    victim = os.path.join(out, rows[0]["file"])
    blob = bytearray(open(victim, "rb").read())
    blob[600] ^= 0xFF
    open(victim, "wb").write(bytes(blob))
    bad = {r["file"]: r["ok"] for r in verify_webdataset_shards(spark, out).collect()}
    assert bad[rows[0]["file"]] is False
    assert sum(1 for v in bad.values() if not v) == 1


def test_webdataset_read_roundtrip(spark, media_df, tmp_path):
    from electrician_spark.io import read_webdataset_shards

    out = str(tmp_path / "rt")
    _export(spark, media_df, out)
    back = read_webdataset_shards(
        spark, out, binary_members=("png",), text_members=("json", "txt")
    )
    rows = back.collect()
    assert len(rows) == 40
    src = {r["doc_id"]: r for r in media_df.collect()}
    for r in rows:
        doc_id = int(r["key"].split("_")[1])
        s = src[doc_id]
        assert bytes(r["png"]) == bytes(s["payload"])
        assert r["json"] == s["meta"]
        assert r["txt"] == s["caption"]  # None round-trips as NULL
        # shard column matches the key-derived shard
        k = _key(1, doc_id)
        assert r["shard"] == (k * 4) >> 32
    # in-tar order preserved per shard: keys ascending within shard
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["key"])
    for ks in by_shard.values():
        assert ks == sorted(ks)


def test_reexport_with_fewer_shards_clears_stale_tars(spark, media_df, tmp_path):
    # Re-export into the same path with fewer shards must remove the
    # previous epoch's extra tars — the shard-*.tar reader glob would
    # otherwise silently mix epochs (r15 review finding).
    import glob
    import os

    from electrician_spark import io as eio

    path = str(tmp_path / "wds")
    eio.write_webdataset_shards(
        media_df, path, n_shards=4, members={"txt": "caption"}, id_col="doc_id"
    )
    assert len(glob.glob(os.path.join(path, "shard-*.tar"))) == 4
    eio.write_webdataset_shards(
        media_df, path, n_shards=2, members={"txt": "caption"}, id_col="doc_id"
    )
    assert len(glob.glob(os.path.join(path, "shard-*.tar"))) == 2
