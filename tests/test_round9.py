"""Round-9 pins: the ANN-celled hard-negative miner (the round-8
verdict's one `weak` — its exhaustive pool replaced by LSH candidate
cells) recall floor + planted semantics, and the baseline-JPEG codec
(sixth oracled decode family member, first transform-coded one).
"""

import random

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from open_reaction_database_web_scraper_spark.operators.multimodal import (
    CORRUPT_SENTINEL,
    _jpeg_decode,
    decode,
    decode_real,
    encode_jpeg,
)
from open_reaction_database_web_scraper_spark.registry import (
    REGISTRY,
    load_all_operators,
)

load_all_operators()


# ---------------------------------------------------------------------------
# JPEG codec


def _const_block_img(vals, bw, bh) -> bytes:
    """Raster whose 8×8 blocks are constant — the provably-lossless
    input class (DC-only blocks quantize exactly)."""
    tiles = np.asarray(vals, dtype=np.uint8).reshape(bh, bw)
    return np.kron(tiles, np.ones((8, 8), dtype=np.uint8)).tobytes()


def test_jpeg_roundtrip_exact_constant_blocks():
    vals = list(range(48, 72))  # the sha-hex ASCII neighborhood
    img = _const_block_img(vals, 6, 4)
    assert decode_real(encode_jpeg(img, 48, 32), "jpeg") == \
        (64 * sum(vals), 48, 32)
    # extremes: 0 → DC −1024 (category 11), 255 → +1016
    img = _const_block_img([0, 255], 2, 1)
    assert _jpeg_decode(encode_jpeg(img, 16, 8)) == (64 * 255, 16, 8)
    # 8×8 smallest legal image
    assert _jpeg_decode(encode_jpeg(b"\x80" * 64, 8, 8)) == \
        (64 * 128, 8, 8)


def test_jpeg_dc_dpcm_and_stuffing_stress():
    """1024 random constant blocks drive the DC DPCM chain through
    every category sign/size and make 0xFF bytes (hence stuffing)
    statistically certain in the entropy stream — still bit-exact."""
    random.seed(9)
    vals = [random.randrange(256) for _ in range(32 * 32)]
    p = encode_jpeg(_const_block_img(vals, 32, 32), 256, 256)
    assert b"\xff\x00" in p[2:-2], "no stuffed byte — stress too weak"
    assert _jpeg_decode(p) == (64 * sum(vals), 256, 256)


def test_jpeg_ac_path_near_exact():
    """Arbitrary rasters exercise the AC run/size path (EOB, ZRL,
    nonzero coefficients): geometry is exact and every pixel is
    within the flat-quantizer error bound (|err| ≤ 8 worst case;
    observed ≤ 2)."""
    random.seed(17)
    raw = bytes(random.randrange(256) for _ in range(64 * 64))
    s, w, h = _jpeg_decode(encode_jpeg(raw, 64, 64))
    assert (w, h) == (64, 64)
    ref = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
    assert abs(s - int(ref.sum())) <= 8 * 64 * 64
    # gradient raster → long zero runs → ZRL/EOB coverage
    grad = bytes((x + y) % 256 for y in range(32) for x in range(48))
    s2, w2, h2 = _jpeg_decode(encode_jpeg(grad, 48, 32))
    assert (w2, h2) == (48, 32)
    assert abs(s2 - sum(grad)) / len(grad) < 2.0


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 255), min_size=1, max_size=48))
def test_jpeg_roundtrip_property(vals):
    """Property fuzz (the LZW-fuzz discipline that caught a real
    off-by-one in round 8): any constant-block raster of any block
    count roundtrips exactly through encode→decode."""
    bw = len(vals)
    p = encode_jpeg(_const_block_img(vals, bw, 1), bw * 8, 8)
    assert _jpeg_decode(p) == (64 * sum(vals), bw * 8, 8)


def test_jpeg_rejects_corrupt_and_unsupported():
    img = _const_block_img([100, 200], 2, 1)
    p = encode_jpeg(img, 16, 8)
    with pytest.raises(ValueError):
        _jpeg_decode(p[:40])                   # truncated mid-segment
    with pytest.raises(ValueError):
        _jpeg_decode(b"\xff\xd8\xff\xd9")      # EOI before SOS
    with pytest.raises(ValueError):
        _jpeg_decode(b"NOTAJPEG")
    # progressive SOF2 must raise, not mis-decode
    bad = p.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        _jpeg_decode(bad)
    # dispatcher: corrupt jpeg → sentinel, never an exception
    assert decode(p[:40], "jpeg") == CORRUPT_SENTINEL
    assert decode(p, "jpeg") == (64 * 300, 16, 8)
    # encoder contract
    with pytest.raises(ValueError):
        encode_jpeg(b"\x00" * 63, 8, 8)        # size mismatch
    with pytest.raises(ValueError):
        encode_jpeg(b"\x00" * 60, 10, 6)       # unaligned dims


# ---------------------------------------------------------------------------
# sample_hard_negative_mine_ann


def test_hard_negative_ann_recall_floor(spark, sf_dir):
    """The celled miner must recover ≥0.6 of the exhaustive miner's
    top-3 cross-label pairs (the vector_ann_* recall-floor pattern;
    measured 0.80 at sf0.001 with 8 tables × adaptive bits)."""
    exact = {(r.query_id, r.negative_id)
             for r in REGISTRY["sample_hard_negative_mine"]
             .fn(spark, sf_dir).collect()}
    ann = {(r.query_id, r.negative_id)
           for r in REGISTRY["sample_hard_negative_mine_ann"]
           .fn(spark, sf_dir).collect()}
    assert exact, "exhaustive miner returned nothing"
    assert len(exact & ann) / len(exact) >= 0.6


def test_hard_negative_ann_excludes_same_label(spark, tmp_path):
    """Celled variant: negatives are cross-label only; the same-label
    near-twin never appears even though it shares every LSH bucket
    with the probe, and the near-identical cross-label vector (which
    provably collides — identical sign pattern) is mined first."""
    base = [1.0, 0.0, 2.0, -1.0]
    twin = [x * 1.001 for x in base]          # same label, cos ~ 1
    close = [1.0, 0.1, 2.0, -1.0]             # other label, cos ~ 0.998
    far = [0.0, 5.0, 0.0, 0.0]                # other label, cos 0
    rows = [(0, "a", base), (1, "a", twin), (2, "b", close),
            (3, "b", far)]
    d = str(tmp_path / "emb")
    spark.createDataFrame(
        rows, "vec_id bigint, label string, embedding array<double>") \
        .write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    out = sorted(REGISTRY["sample_hard_negative_mine_ann"].fn(spark, d)
                 .collect(), key=lambda r: -r.cosine)
    assert all(r.query_id == 0 and r.neg_label == "b" for r in out)
    assert 1 not in {r.negative_id for r in out}   # twin excluded
    assert out and out[0].negative_id == 2         # hard first
    assert {r.negative_id for r in out} <= {2, 3}


def test_hard_negative_ann_subset_of_pool(spark, sf_dir):
    """Every mined pair must be a (probe, non-probe) cross-label pair
    — the cells only ever NARROW the exhaustive pool."""
    rows = REGISTRY["sample_hard_negative_mine_ann"].fn(
        spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.query_id % 25 == 0
        assert r.negative_id % 25 != 0
        assert r.label != r.neg_label



# ---------------------------------------------------------------------------
# round-8 ADVICE closures: ORD stream offset retention, GIF EOI
# tolerance (the sink-lock takeover is pinned in test_round7.py's
# updated lock test)


def test_ord_stream_offset_drops_pruned_names(tmp_path):
    """Retention pruning: a deleted capture file's name must leave
    the next data-bearing offset (round-8 advice: the seen-set used
    to grow with the ALL-TIME file count), and replay of a committed
    range is untouched (end.seen ∖ start.seen never mentions the
    pruned name)."""
    import json
    import os

    from open_reaction_database_web_scraper_spark.sources.ord_datasource \
        import OrdStreamReader

    d = str(tmp_path / "retention")
    os.makedirs(d)

    def mk(name, ds, n):
        doc = {ds: {
            "dataset_id": ds, "total_reactions_scraped": n,
            "reactions": [{"reaction_id": f"{ds}-{i}",
                           "success": True, "inputsMap": {"a": 1},
                           "outcomes": [{}]} for i in range(n)]}}
        with open(os.path.join(d, name), "w", encoding="utf-8") as f:
            json.dump(doc, f)

    r = OrdStreamReader({"path": f"{d}/cap-*.json"})
    mk("cap-001.json", "ds1", 2)
    rows1, off1 = r.read(r.initialOffset())
    assert off1 == {"seen": ["cap-001.json"]}
    mk("cap-002.json", "ds2", 3)
    rows2, off2 = r.read(off1)
    assert off2 == {"seen": ["cap-001.json", "cap-002.json"]}
    # retention prunes cap-001; next data-bearing batch drops it
    os.remove(os.path.join(d, "cap-001.json"))
    mk("cap-003.json", "ds3", 1)
    rows3, off3 = r.read(off2)
    assert len(list(rows3)) == 1
    assert off3 == {"seen": ["cap-002.json", "cap-003.json"]}
    # quiet tick: offset unchanged (no spurious empty batches)
    rows4, off4 = r.read(off3)
    assert list(rows4) == [] and off4 == off3
    # committed-range replay of the latest batch is exact
    replay = list(r.readBetweenOffsets(off2, off3))
    assert len(replay) == 1 and replay[0][0] == "ds3"


def test_gif_tolerates_missing_eoi():
    """Spec-tolerated encoder quirk (round-8 advice): LZW data that
    ends at the sub-block terminator WITHOUT an explicit EOI code
    must decode when the raster is complete — and still raise when
    the raster is short."""
    import struct

    from open_reaction_database_web_scraper_spark.operators.multimodal \
        import _gif_decode, _lzw_decode

    def pack_lsb(codes, width):
        acc = n = 0
        out = bytearray()
        for c in codes:
            acc |= c << n
            n += width
            while n >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                n -= 8
        if n:
            out.append(acc & 0xFF)
        return bytes(out)

    idx = b"\x05\x09\x0c"
    data = pack_lsb([256, 5, 9, 12], 9)  # CLEAR + literals, no EOI
    assert _lzw_decode(data, 8, 3) == bytearray(idx)
    # short raster at stream end is still corrupt
    with pytest.raises(ValueError):
        _lzw_decode(data, 8, 4)
    # end-to-end: a full GIF built without the EOI code decodes
    header = b"GIF89a" + struct.pack("<HH", 3, 1) + bytes([0xF7, 0, 0])
    gct = bytes(v for i in range(256) for v in (i, i, i))
    desc = b"\x2C" + struct.pack("<HHHH", 0, 0, 3, 1) + b"\x00"
    blocks = bytes([8, len(data)]) + data + b"\x00"
    gif = header + gct + desc + blocks + b"\x3B"
    assert _gif_decode(gif) == (5 + 9 + 12, 3, 1)

# ---------------------------------------------------------------------------
# AVI video container (seventh codec)


def test_avi_roundtrip_exact():
    from open_reaction_database_web_scraper_spark.operators.multimodal \
        import _avi_decode, encode_avi
    frames = [bytes([10, 20, 30, 40, 50, 60]), bytes(range(6)),
              bytes([0] * 6), bytes([255] * 6)]
    p = encode_avi(frames, 3, 2)
    exp = 3 * sum(sum(f) for f in frames)
    assert _avi_decode(p) == (exp, 4, 6)
    # single 1x1 frame — smallest legal stream; stride pads 3 -> 4
    assert _avi_decode(encode_avi([b"\x7f"], 1, 1)) == (3 * 127, 1, 1)
    # wide geometry where rows need no padding (w*3 % 4 == 0)
    f8 = bytes(range(16))
    assert _avi_decode(encode_avi([f8], 8, 2)) == (3 * sum(f8), 1, 16)


def test_avi_rejects_corrupt_and_unsupported():
    from open_reaction_database_web_scraper_spark.operators.multimodal \
        import CORRUPT_SENTINEL, _avi_decode, decode, encode_avi
    p = encode_avi([bytes(range(6))] * 2, 3, 2)
    with pytest.raises(ValueError):
        _avi_decode(b"RIFFxxxxWAVE")          # wrong RIFF type
    with pytest.raises(ValueError):
        _avi_decode(p[:40])                    # truncated chunk
    with pytest.raises(ValueError):
        _avi_decode(p.replace(b"00db", b"00dc"))  # compressed seam
    # frame-count mismatch: declared 2, one frame chunk dropped
    i = p.rindex(b"00db")
    with pytest.raises(ValueError):
        _avi_decode(p[:i] + b"JUNK" + p[i + 4:])
    assert decode(p[:40], "avi") == CORRUPT_SENTINEL
    assert decode(p, "avi") == (3 * 2 * sum(range(6)), 2, 6)
    with pytest.raises(ValueError):
        encode_avi([b"\x00" * 5], 3, 2)       # frame size mismatch


@settings(max_examples=25, deadline=None)
@given(st.lists(st.binary(min_size=6, max_size=6), min_size=1,
                max_size=12))
def test_avi_roundtrip_property(frames):
    from open_reaction_database_web_scraper_spark.operators.multimodal \
        import _avi_decode, encode_avi
    p = encode_avi(frames, 3, 2)
    exp = 3 * sum(sum(f) for f in frames)
    assert _avi_decode(p) == (exp, len(frames), 6)


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
