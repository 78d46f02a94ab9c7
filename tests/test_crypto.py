"""Encryption-at-rest tests (SURVEY.md §2.6; reference
utils/sbox/sbox.go + store/store.go:617-635).

The cipher core is pinned to the PUBLIC RFC 8439 test vectors — not to
our own implementation — then exercised through the Spark column path
and the bucket-store write/read round trip.
"""

from __future__ import annotations

import numpy as np
import pytest

from skewer_spark.functions import crypto as C

SECRET = bytes.fromhex("9d" * 32)


# ---------------------------------------------------------------------------
# known-answer vectors (RFC 8439 §2.3.2, §2.4.2 — public spec)
# ---------------------------------------------------------------------------


def test_chacha20_block_vector_rfc8439():
    key = bytes(range(32))
    nonce = bytes.fromhex("000000090000004a00000000")
    ks = C._chacha20_blocks(
        np.frombuffer(key, dtype="<u4"),
        np.array([1], dtype=np.uint32),
        np.frombuffer(nonce, dtype="<u4").reshape(1, 3),
    )
    assert ks[0].tobytes() == bytes.fromhex(
        "10f1e7e4d13b5915500fdd1fa32071c4c7d1f4c733c068030422aa9ac3d46c4e"
        "d2826446079faa0914c2d705d98b02a2b5129cd1de164eb9cbd083e8a2503c4e"
    )


def test_chacha20_cipher_vector_rfc8439():
    key = bytes(range(32))
    nonce = bytes.fromhex("000000000000004a00000000")
    pt = (
        b"Ladies and Gentlemen of the class of '99: If I could offer you "
        b"only one tip for the future, sunscreen would be it."
    )
    ct = C.chacha20_xor_batch([pt], key, [nonce], initial_counter=1)[0]
    assert ct == bytes.fromhex(
        "6e2e359a2568f98041ba0728dd0d6981e97e7aec1d4360c20a27afccfd9fae0b"
        "f91b65c5524733ab8f593dabcd62b3571639d624e65152ab8f530c359f0861d8"
        "07ca0dbf500d6a6156a38e088a22b65e52bc514d16ccf806818ce91ab7793736"
        "5af90bbf74a35be6b40b8eedf2785e42874d"
    )


def test_openssl_and_numpy_paths_agree():
    """The OpenSSL fast path and the numpy fallback must be
    byte-identical on every length class (empty, sub-block, exact
    block, multi-block) and at a nonzero initial counter."""
    key = bytes(range(64, 96))
    msgs = [b"", b"z", b"y" * 64, b"x" * 65, b"w" * 1000, b"v" * 4096]
    nonces = [bytes([200 + i]) * 12 for i in range(len(msgs))]
    for ctr in (0, 1, 7):
        fast = C.chacha20_xor_batch(msgs, key, nonces, initial_counter=ctr)
        slow = C.chacha20_xor_batch(
            msgs, key, nonces, initial_counter=ctr, force_numpy=True
        )
        assert fast == slow


def test_batched_equals_single_message():
    """One vectorized pass over a mixed batch == per-message calls."""
    key = bytes(range(32, 64))
    msgs = [b"", b"a", b"b" * 63, b"c" * 64, b"d" * 65, b"e" * 300]
    nonces = [bytes([i]) * 12 for i in range(len(msgs))]
    batch = C.chacha20_xor_batch(msgs, key, nonces)
    for m, n, got in zip(msgs, nonces, batch):
        assert C.chacha20_xor_batch([m], key, [n])[0] == got


# ---------------------------------------------------------------------------
# sealed-box semantics
# ---------------------------------------------------------------------------


def test_seal_open_round_trip_and_nulls():
    payloads = [b"", b"x", b"hello world" * 40, None, bytes(1000)]
    uids = [f"u{i}" for i in range(len(payloads))]
    boxes = C.seal_batch(payloads, uids, SECRET)
    assert boxes[3] is None
    for p, b in zip(payloads, boxes):
        if p is not None:
            assert len(b) == len(p) + C.OVERHEAD  # sbox.go LenEncrypted
            assert p not in b or p == b""  # ciphertext hides plaintext
    assert C.open_batch(boxes, SECRET) == payloads


def test_deterministic_nonce_idempotent_rerun():
    """uid-derived nonces: re-encrypting the same rows is byte-identical
    (bucket rerun → same files → resume equality holds)."""
    payloads = [b"payload-%d" % i for i in range(50)]
    uids = [f"uid{i}" for i in range(50)]
    assert C.seal_batch(payloads, uids, SECRET) == C.seal_batch(
        payloads, uids, SECRET
    )
    # different uid ⇒ different nonce ⇒ different ciphertext
    b1 = C.seal_batch([b"same"], ["u1"], SECRET)[0]
    b2 = C.seal_batch([b"same"], ["u2"], SECRET)[0]
    assert b1 != b2


def test_random_nonce_mode_matches_reference_behavior():
    b1 = C.seal_batch([b"same"], ["u"], SECRET, nonce_mode="random")[0]
    b2 = C.seal_batch([b"same"], ["u"], SECRET, nonce_mode="random")[0]
    assert b1 != b2
    assert C.open_batch([b1, b2], SECRET) == [b"same", b"same"]


def test_tamper_and_truncation_fail_loud():
    box = C.seal_batch([b"secret payload"], ["u"], SECRET)[0]
    for mutant in (
        box[:-1] + bytes([box[-1] ^ 1]),          # flip ct byte
        bytes([box[0] ^ 1]) + box[1:],            # flip nonce byte
        box[: C.NONCE_LEN] + bytes([box[C.NONCE_LEN] ^ 1])
        + box[C.NONCE_LEN + 1:],                  # flip tag byte
        box[: C.OVERHEAD - 1],                    # truncated
    ):
        with pytest.raises(ValueError):
            C.open_batch([mutant], SECRET)
    with pytest.raises(ValueError):
        C.open_batch([box], bytes(32))  # wrong key


def test_key_separation_and_env_parse(monkeypatch):
    enc, mac, kid = C.derive_keys(SECRET)
    assert len({enc, mac}) == 2 and len(kid) == 8
    with pytest.raises(ValueError):
        C.derive_keys(b"short")
    monkeypatch.setenv("SKEWER_BOX_SECRET", SECRET.hex())
    assert C.secret_from_env() == SECRET
    monkeypatch.setenv("SKEWER_BOX_SECRET", "zz")
    with pytest.raises(ValueError):
        C.secret_from_env()
    monkeypatch.delenv("SKEWER_BOX_SECRET")
    assert C.secret_from_env() is None


# ---------------------------------------------------------------------------
# Spark column path + encrypted bucket store
# ---------------------------------------------------------------------------


def test_seal_open_columns(spark):
    from pyspark.sql import functions as F

    df = spark.range(200).select(
        F.concat(F.lit("uid"), F.col("id")).alias("uid"),
        F.encode(F.concat(F.lit("msg "), F.col("id")), "utf-8").alias(
            "encoded"
        ),
    )
    sealed = df.withColumn(
        "boxed", C.seal_col("encoded", "uid", SECRET)
    )
    opened = sealed.withColumn("back", C.open_col("boxed", SECRET))
    rows = opened.select(
        (F.col("back") == F.col("encoded")).alias("ok"),
        (F.col("boxed") != F.col("encoded")).alias("differs"),
        (F.length("boxed") == F.length("encoded") + C.OVERHEAD).alias(
            "len_ok"
        ),
    ).collect()
    assert all(r.ok and r.differs and r.len_ok for r in rows)


def test_sink_salt_prevents_keystream_reuse(spark):
    """Fan-out gives one uid a DIFFERENT plaintext per sink; the sink
    salt must give each a distinct nonce, or two stored ciphertexts
    XOR to the XOR of their plaintexts (two-time pad)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("u1", "sink_alerts", b"payload A"), ("u1", "sink_tools", b"payload B")],
        "uid string, sink string, encoded binary",
    )
    boxed = df.withColumn(
        "boxed", C.seal_col("encoded", "uid", SECRET, salt_col="sink")
    ).collect()
    n1, n2 = (bytes(r.boxed[: C.NONCE_LEN]) for r in boxed)
    assert n1 != n2  # distinct nonces despite the shared uid
    assert C.open_batch([bytes(r.boxed) for r in boxed], SECRET) == [
        b"payload A", b"payload B",
    ]
    # still deterministic per (uid, sink): rerun is byte-identical
    again = df.withColumn(
        "boxed", C.seal_col("encoded", "uid", SECRET, salt_col="sink")
    ).collect()
    assert [bytes(r.boxed) for r in again] == [bytes(r.boxed) for r in boxed]


def test_encrypted_sink_round_trip(spark, tmp_path):
    """write_outputs(secret=...) seals the sink payloads at rest; the
    parquet on disk holds no plaintext; read_sink(secret=...) restores
    byte-identical payloads vs the unencrypted run."""
    from pyspark.sql import functions as F

    from skewer_spark.plans.job import (
        build_routed, read_sink, write_outputs,
    )
    from skewer_spark.synth import transcripts_df

    src = transcripts_df(spark, 6, 40)
    routed = build_routed(src)

    plain_dir = str(tmp_path / "plain")
    enc_dir = str(tmp_path / "enc")
    write_outputs(spark, routed, plain_dir)
    write_outputs(spark, routed, enc_dir, secret=SECRET)

    plain = read_sink(spark, plain_dir, "sink_firehose").select("uid", "encoded")
    enc_raw = read_sink(spark, enc_dir, "sink_firehose").select(
        "uid", F.col("encoded").alias("boxed")
    )
    # at rest: every stored payload is nonce||tag||ct, not the encoding
    # (the plain store keeps `encoded` as string; the sealed store holds
    # binary boxes — compare at the byte level)
    j = plain.join(enc_raw, "uid")
    assert j.count() > 0
    bad = j.filter(
        (F.col("boxed") == F.encode("encoded", "utf-8"))
        | (F.octet_length("boxed")
           != F.octet_length(F.encode("encoded", "utf-8")) + C.OVERHEAD)
    ).count()
    assert bad == 0

    # decrypting read restores byte equality
    dec = read_sink(spark, enc_dir, "sink_firehose", secret=SECRET).select(
        "uid", F.col("encoded").alias("dec")
    )
    mism = plain.join(dec, "uid").filter(
        F.col("dec") != F.encode("encoded", "utf-8")
    ).count()
    assert mism == 0

    # rerun writes byte-identical boxes (resume idempotence)
    enc2_dir = str(tmp_path / "enc2")
    write_outputs(spark, routed, enc2_dir, secret=SECRET)
    enc2 = read_sink(spark, enc2_dir, "sink_firehose").select(
        "uid", F.col("encoded").alias("boxed2")
    )
    diff = enc_raw.join(enc2, "uid").filter(
        F.col("boxed") != F.col("boxed2")
    ).count()
    assert diff == 0


def test_seal_col_null_uid_refused(spark):
    """A NULL uid (or salt) cannot derive a unique nonce; sealing it
    would reuse one keystream across distinct plaintexts.  concat_ws
    used to SKIP the null silently — the basis now propagates NULL and
    the UDF fails loudly."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("u1", b"alpha"), (None, b"bravo"), (None, b"charlie")],
        "uid string, encoded binary",
    )
    sealed = df.withColumn("boxed", C.seal_col("encoded", "uid", SECRET))
    with pytest.raises(Exception, match="NULL nonce basis"):
        sealed.collect()
    # and a uid containing the 0x1f separator cannot collide with a
    # different (uid, salt) split: length prefix disambiguates
    tricky = spark.createDataFrame(
        [("a\x1fb", "s", b"x"), ("a", "b\x1fs", b"y")],
        "uid string, salt string, encoded binary",
    )
    boxes = tricky.withColumn(
        "boxed", C.seal_col("encoded", "uid", SECRET, salt_col="salt")
    ).select("boxed").collect()
    n0, n1 = bytes(boxes[0].boxed)[:12], bytes(boxes[1].boxed)[:12]
    assert n0 != n1


def test_store_encryption_mode_pinned(spark, tmp_path, monkeypatch):
    """run_pipeline pins the store's at-rest mode at first write: a
    resume without the secret (or with a different key) fails fast
    instead of silently mixing sealed and plaintext buckets; read_sink
    refuses the two silent failure shapes."""
    from skewer_spark.plans import job
    from skewer_spark.synth import transcripts_df

    inp = str(tmp_path / "inp")
    transcripts_df(spark, 6, 20).write.parquet(inp)

    out = str(tmp_path / "sealed_store")
    monkeypatch.setenv("SKEWER_BOX_SECRET", SECRET.hex())
    with pytest.raises(RuntimeError):
        job.run_pipeline(spark, inp, out, n_buckets=2, fail_after=1,
                         run_id="r1")

    # resume on a host without the secret: refused before any write
    monkeypatch.delenv("SKEWER_BOX_SECRET")
    with pytest.raises(ValueError, match="refusing to mix"):
        job.run_pipeline(spark, inp, out, n_buckets=2, run_id="r2")

    # resume with a DIFFERENT key: refused
    monkeypatch.setenv("SKEWER_BOX_SECRET", "ab" * 32)
    with pytest.raises(ValueError, match="wrong SKEWER_BOX_SECRET"):
        job.run_pipeline(spark, inp, out, n_buckets=2, run_id="r3")

    # right key: resume completes
    monkeypatch.setenv("SKEWER_BOX_SECRET", SECRET.hex())
    job.run_pipeline(spark, inp, out, n_buckets=2, run_id="r4")

    # sealed store without secret / plaintext store with secret: loud
    with pytest.raises(ValueError, match="sealed at rest"):
        job.read_sink(spark, out, "sink_firehose")
    assert job.read_sink(spark, out, "sink_firehose",
                         secret=SECRET).count() > 0

    plain_out = str(tmp_path / "plain_store")
    monkeypatch.delenv("SKEWER_BOX_SECRET")
    job.run_pipeline(spark, inp, plain_out, n_buckets=2, run_id="p1")
    with pytest.raises(ValueError, match="not sealed"):
        job.read_sink(spark, plain_out, "sink_firehose", secret=SECRET)
    assert job.read_sink(spark, plain_out, "sink_firehose").count() > 0


def test_sealed_store_has_no_plaintext_content(spark, tmp_path, monkeypatch):
    """Sealing only the sinks' `encoded` would leave full plaintext
    copies of every message in routed/ and _staged/ — the store must
    box ALL content-bearing columns (SEALED_CONTENT_COLUMNS); routing
    metadata stays clear by design (the Parquet-modular-encryption
    pattern: pruning/metrics work without the key)."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from skewer_spark.plans import job
    from skewer_spark.synth import transcripts_df

    inp = str(tmp_path / "inp")
    transcripts_df(spark, 6, 20).write.parquet(inp)

    plain_out = str(tmp_path / "plain")
    sealed_out = str(tmp_path / "sealed")
    job.run_pipeline(spark, inp, plain_out, n_buckets=2, run_id="p1")
    monkeypatch.setenv("SKEWER_BOX_SECRET", SECRET.hex())
    job.run_pipeline(spark, inp, sealed_out, n_buckets=2, run_id="s1")
    monkeypatch.delenv("SKEWER_BOX_SECRET")

    # at rest: every content column in _staged and routed/ is a binary
    # box (nonce||tag||ct), never the plaintext string
    for sub in ("_staged", "routed"):
        raw = spark.read.parquet(os.path.join(sealed_out, sub))
        present = [c for c in job.SEALED_CONTENT_COLUMNS if c in raw.columns]
        assert present, f"{sub}: no content columns found"
        for c in present:
            assert isinstance(
                raw.schema[c].dataType, T.BinaryType
            ), f"{sub}.{c} stored as {raw.schema[c].dataType}"
        # boxes carry the fixed overhead (spot check one column)
        n_bad = raw.filter(
            F.col(present[0]).isNotNull()
            & (F.octet_length(present[0]) < C.OVERHEAD)
        ).count()
        assert n_bad == 0

    # read_routed enforces the mode contract and revives content
    with pytest.raises(ValueError, match="sealed at rest"):
        job.read_routed(spark, sealed_out)
    with pytest.raises(ValueError, match="not sealed"):
        job.read_routed(spark, plain_out, secret=SECRET)
    keys = ["conv_id", "turn_idx"]
    dec = job.read_routed(spark, sealed_out, secret=SECRET).select(
        *keys, "message", "properties_json")
    ref = job.read_routed(spark, plain_out).select(
        *keys, "message", "properties_json")
    mism = (
        dec.alias("a").join(ref.alias("b"), keys)
        .filter(
            ~(F.col("a.message").eqNullSafe(F.col("b.message")))
            | ~(F.col("a.properties_json").eqNullSafe(
                F.col("b.properties_json")))
        ).count()
    )
    assert dec.count() == ref.count() and mism == 0

    # sink payloads still decrypt byte-identically (unchanged contract)
    assert job.read_sink(spark, sealed_out, "sink_firehose",
                         secret=SECRET).count() > 0


def test_encryption_guard_runs_before_staging(spark, tmp_path, monkeypatch):
    """The at-rest mode check must fire BEFORE stage_input writes: a
    wrong-key resume attempt may not mutate the store (finding: the old
    order staged the raw input first, contradicting the guard's 'fail
    fast before writing anything' contract)."""
    import os

    from skewer_spark.plans import job
    from skewer_spark.synth import transcripts_df

    inp = str(tmp_path / "inp2")
    transcripts_df(spark, 3, 10).write.parquet(inp)

    out = str(tmp_path / "pinned")
    # pin the store sealed without running anything
    job._check_store_encryption(out, SECRET)
    monkeypatch.delenv("SKEWER_BOX_SECRET", raising=False)
    with pytest.raises(ValueError, match="refusing to mix"):
        job.run_pipeline(spark, inp, out, n_buckets=2, run_id="g1")
    assert not os.path.exists(os.path.join(out, "_staged"))
