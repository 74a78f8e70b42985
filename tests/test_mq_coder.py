"""MQ arithmetic coder (T.800 Annex C / T.88 Annex E) tests.

The 47-state probability table cannot be re-derived offline, so — house
policy, same as the CCITT/VP8 tables — we pin the widely-cited head rows
against the spec listing and rely on encoder/decoder round-trip symmetry
to surface any transcription error in the tail (an entry error breaks
self-consistency long before it silently corrupts output).
"""

import random

import pytest

from docvision_spark.kernel.mq_coder import MQ_TABLE, MqDecoder, MqEncoder


def test_table_shape():
    assert len(MQ_TABLE) == 47
    for qe, nmps, nlps, switch in MQ_TABLE:
        assert 0 < qe <= 0x5601
        assert 0 <= nmps < 47 and 0 <= nlps < 47
        assert switch in (0, 1)


def test_table_head_pins():
    # T.800 Table C.2 rows 0-5 and the terminal rows, as published.
    assert MQ_TABLE[0] == (0x5601, 1, 1, 1)
    assert MQ_TABLE[1] == (0x3401, 2, 6, 0)
    assert MQ_TABLE[2] == (0x1801, 3, 9, 0)
    assert MQ_TABLE[3] == (0x0AC1, 4, 12, 0)
    assert MQ_TABLE[4] == (0x0521, 5, 29, 0)
    assert MQ_TABLE[5] == (0x0221, 38, 33, 0)
    assert MQ_TABLE[45] == (0x0001, 45, 43, 0)
    assert MQ_TABLE[46] == (0x5601, 46, 46, 0)  # non-adaptive state


def test_switch_only_on_state_zero_rows():
    # SWITCH=1 marks the start-of-chain states (0, 6, 14 in Table C.2).
    assert [i for i, r in enumerate(MQ_TABLE) if r[3]] == [0, 6, 14]


@pytest.mark.parametrize("ncx,bias", [(1, 0.95), (1, 0.5), (3, 0.9), (5, 0.2)])
def test_round_trip(ncx, bias):
    rng = random.Random(hash((ncx, bias)) & 0xFFFF)
    for n in (0, 1, 2, 7, 63, 500, 4000):
        bits = [
            (rng.randrange(ncx), 1 if rng.random() < bias else 0)
            for _ in range(n)
        ]
        enc = MqEncoder()
        ectx = [[0, 0] for _ in range(ncx)]
        for cx, d in bits:
            enc.encode(ectx[cx], d)
        data = enc.flush()
        dec = MqDecoder(data)
        dctx = [[0, 0] for _ in range(ncx)]
        for cx, d in bits:
            assert dec.decode(dctx[cx]) == d


def test_compression_on_skewed_source():
    # 8000 bits at p(1)=0.99 must compress far below 1000 bytes.
    rng = random.Random(11)
    enc = MqEncoder()
    ctx = [0, 0]
    for _ in range(8000):
        enc.encode(ctx, 1 if rng.random() < 0.99 else 0)
    assert len(enc.flush()) < 200


def test_decoder_truncation_totality():
    # Decode never reads past the segment and never raises: a truncated
    # or garbage codestream degrades to the endless-1-fill convention.
    rng = random.Random(13)
    for _ in range(100):
        data = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 40)))
        dec = MqDecoder(data)
        ctx = [0, 0]
        for _ in range(2000):
            assert dec.decode(ctx) in (0, 1)
        assert dec.bp <= len(data) + 1


def test_decoder_tolerates_truncated_valid_stream():
    rng = random.Random(17)
    enc = MqEncoder()
    ctx = [0, 0]
    bits = [1 if rng.random() < 0.9 else 0 for _ in range(2000)]
    for d in bits:
        enc.encode(ctx, d)
    data = enc.flush()
    # Chop the tail: prefix bits still decode identically.
    dec = MqDecoder(data[: len(data) // 2])
    dctx = [0, 0]
    head = [dec.decode(dctx) for _ in range(200)]
    full = MqDecoder(data)
    fctx = [0, 0]
    assert head == [full.decode(fctx) for _ in range(200)]


def test_encoder_output_self_pin():
    # Regression pin: deterministic input -> exact bytes. Catches any
    # accidental change to the byte-stuffing / flush discipline.
    enc = MqEncoder()
    ctx = [0, 0]
    for i in range(64):
        enc.encode(ctx, (i * 7) % 3 == 0)
    data = enc.flush()
    assert data == bytes.fromhex("ad89cdb7249249247f"), data.hex()


def test_ff_stuffing_discipline():
    # Any byte following 0xFF in the codestream must be <= 0x8F.
    rng = random.Random(23)
    for trial in range(50):
        enc = MqEncoder()
        ncx = 1 + trial % 3
        ctxs = [[0, 0] for _ in range(ncx)]
        for _ in range(3000):
            enc.encode(ctxs[rng.randrange(ncx)], rng.randrange(2))
        data = enc.flush()
        for a, b in zip(data, data[1:]):
            if a == 0xFF:
                assert b <= 0x8F
