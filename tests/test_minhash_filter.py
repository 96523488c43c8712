"""MinHash token filter goldens — transcribed from the reference's
TestMinHashFilter.java (hash test vectors and exact char-packed
fingerprint strings)."""

import pytest

from lucene_spark.analysis.minhash import (
    MinHashFilter,
    combine_ordered,
    murmur3_x64_128,
)

M64 = (1 << 64) - 1
SHINGLE_A = "woof woof woof woof woof"
SHINGLE_B = "woof woof woof woof puff"


def as_unsigned(v: int) -> int:
    return v & M64


def test_int_hash():
    # testIntHash: murmur over the 4 big-endian bytes of 0
    v1, v2 = murmur3_x64_128((0).to_bytes(4, "big"))
    assert v1 == as_unsigned(-3485513579396041028)
    assert v2 == 6383328099726337777


def test_string_hash():
    # testStringHash: UTF-16LE bytes of the 5-shingle
    v1, v2 = murmur3_x64_128(SHINGLE_A.encode("utf-16-le"))
    assert v1 == 7638079586852243959
    assert v2 == 4378804943379391304


def test_combine_ordered():
    a, b = (3, 5), (7, 11)
    assert combine_ordered(a, b) == (3 * 37 + 7, 5 * 37 + 11)


def chars(*units):
    return "".join(chr(u) for u in units)


def test_single_input_one_hash():
    # createTokenStream(5, shingleA, 1, 1, 100, false)
    f = MinHashFilter(hash_count=1, bucket_count=1, hash_set_size=100,
                      with_rotation=False, encoding="chars")
    assert f.apply([SHINGLE_A]) == [
        chars(0x2101, 0xD33D, 0xFA85, 0x8059, 0x219D, 0xA1C1, 0xD671, 0x676F)
    ]


def test_single_input_two_hashes():
    # createTokenStream(5, shingleA, 2, 1, 1, false)
    f = MinHashFilter(hash_count=2, bucket_count=1, hash_set_size=1,
                      with_rotation=False, encoding="chars")
    assert f.apply([SHINGLE_A]) == [
        chars(0, 0, 8449, 54077, 64133, 32857, 8605, 41409),
        chars(0, 1, 16887, 58164, 39536, 14926, 6529, 17276),
    ]


def test_two_inputs_one_hash_set100():
    # createTokenStream(5, A + " " + B-as-two-shingles, 1, 1, 100, false)
    f = MinHashFilter(hash_count=1, bucket_count=1, hash_set_size=100,
                      with_rotation=False, encoding="chars")
    assert f.apply([SHINGLE_A, SHINGLE_B]) == [
        chars(0x2101, 0xD33D, 0xFA85, 0x8059, 0x219D, 0xA1C1, 0xD671, 0x676F),
        chars(36347, 63457, 43013, 56843, 52284, 34231, 57934, 42302),
    ]


def test_token_counts():
    toks = [SHINGLE_A, SHINGLE_B]
    # testTokenStream2: 100 hashes x 1 bucket x set 1 -> 100
    assert len(MinHashFilter(100, 1, 1, False).apply(toks)) == 100
    # testTokenStream3: 10 hashes x 1 bucket x set 10 -> 20
    assert len(MinHashFilter(10, 1, 10, False).apply(toks)) == 20
    # testTokenStream4: 10 hashes x 10 buckets x set 1 -> 20 / rotated 100
    assert len(MinHashFilter(10, 10, 1, False).apply(toks)) == 20
    assert len(MinHashFilter(10, 10, 1, True).apply(toks)) == 100
    # testTokenStream5: 1 hash x 100 buckets x set 1 -> 2 / rotated 100
    assert len(MinHashFilter(1, 100, 1, False).apply(toks)) == 2
    rotated = MinHashFilter(1, 100, 1, True).apply(toks)
    assert len(rotated) == 100
    assert len(set(rotated)) == 2


def test_rotation_rolls_forward():
    # the rotated stream is the two values in cyclic runs: once the
    # second value appears it runs to the end, then wraps to the first
    rotated = MinHashFilter(1, 100, 1, True, encoding="chars").apply(
        [SHINGLE_A, SHINGLE_B])
    first = rotated[0]
    changes = sum(
        1 for a, b in zip(rotated, rotated[1:]) if a != b
    )
    assert changes <= 2 and rotated[-1] in (first, *rotated)


def test_hex_encoding_is_parquet_safe():
    out = MinHashFilter(2, 4, 1, True).apply([SHINGLE_A, SHINGLE_B])
    for t in out:
        t.encode("utf-8")  # no lone surrogates
        assert t == t.lower()


def test_empty_stream():
    assert MinHashFilter().apply([]) == []


def test_validation():
    with pytest.raises(ValueError):
        MinHashFilter(hash_count=0)
    with pytest.raises(ValueError):
        MinHashFilter(encoding="base64")


def test_simple_minhash_analyzer_registered():
    from lucene_spark.analysis.analyzer import get_analyzer

    a = get_analyzer("simple_minhash")
    toks = a.tokenize_one(
        "woof woof woof woof woof puff"  # 6 words -> 2 DISTINCT shingles
    )
    # rotation-filled default: 512 buckets, each a hex fingerprint
    assert len(toks) == 512
    assert len(set(toks)) == 2
    for t in toks:
        int(t, 16)  # hex form, parquet-safe


def test_minhash_index_roundtrip(spark, tmp_path):
    """Fingerprint terms survive the full build path (the parquet-safe
    hex contract) and identical texts collide on every bucket."""
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    rows = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "a completely different sentence with other words entirely here now"),
    ]
    src = spark.createDataFrame(rows, "doc_id long, text string")
    p = str(tmp_path / "mh_idx")
    build_index(spark, src, p, IndexConfig(
        field="text", content_col="text", analyzer="simple_minhash",
        doc_id_col="doc_id", docs_per_segment=100, num_batches=1,
    ))
    r = IndexReader(spark, p)
    post = r.postings().select("term", "doc_ids" if False else "term").collect()
    terms = r.term_stats_df().collect()
    by_df = {}
    for row in terms:
        by_df.setdefault(row["doc_freq"], set()).add(row["term"])
    # docs 0 and 1 share every fingerprint; doc 2 shares none
    assert 2 in by_df and 1 in by_df
    assert not (by_df[2] & by_df[1])
