"""MinHash token filter — analysis/common/minhash/MinHashFilter.java.

Collapses a (typically shingled) token stream into LSH min-hash
fingerprint tokens: each input token is hashed with MurmurHash3
x64-128 over its UTF-16LE bytes, re-keyed per hash function by
``combineOrdered`` with the murmur hash of the function index
(big-endian int bytes), bucketed by the top 32 bits of the upper
word, and the ``hash_set_size`` smallest values per (function, bucket)
are kept (unsigned (val2, val1) order, deduplicated). With
``with_rotation`` and set size 1, empty buckets borrow the minimum of
the next non-empty bucket cyclically (MinHashFilter.java:182-201), so
every bucket emits and banded LSH alignment is preserved.

Token text is the reference's exact char packing
(MinHashFilter.java:208-227): [int0,int1 of the function index when
hash_count > 1] + the 128-bit value as 16-bit chars (8 chars total) —
degenerate as characters, byte-faithful. Those chars can be lone
surrogates, which Arrow/Parquet UTF-8 cannot carry, so the filter
defaults to ``encoding="hex"`` for index-safe terms and offers
``encoding="chars"`` for reference-exact parity (the tests compare
the chars form against the reference's golden strings verbatim).

``murmur3_x64_128`` is implemented from the published public-domain
MurmurHash3 algorithm (Austin Appleby), validated against the
reference's own test vectors (testIntHash/testStringHash).

This is the ANALYSIS-side minhash (index-time fingerprint tokens, one
per band bucket). The DataFrame-side near-dup pipeline
(pipeline/dedup.py minhash_lsh_pairs) is a separate operator with its
own hash family; both exist in the reference ecosystem for the same
reason: query-time vs batch dedup.
"""

from __future__ import annotations

from lucene_spark.analysis.filters import TokenFilter

__all__ = ["MinHashFilter", "murmur3_x64_128", "combine_ordered"]

_M64 = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M64
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """(val1, val2) as unsigned 64-bit ints — MurmurHash3 x64 128."""
    h1 = seed & 0xFFFFFFFF
    h2 = seed & 0xFFFFFFFF
    length = len(data)
    rounded = length & ~15
    for i in range(0, rounded, 16):
        k1 = int.from_bytes(data[i : i + 8], "little")
        k2 = int.from_bytes(data[i + 8 : i + 16], "little")
        k1 = (k1 * _C1) & _M64
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M64
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _M64
        h1 = (h1 * 5 + 0x52DCE729) & _M64
        k2 = (k2 * _C2) & _M64
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M64
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _M64
        h2 = (h2 * 5 + 0x38495AB5) & _M64
    tail = data[rounded:]
    if len(tail) > 8:
        k2 = int.from_bytes(tail[8:], "little")
        k2 = (k2 * _C2) & _M64
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M64
        h2 ^= k2
    if tail:
        k1 = int.from_bytes(tail[:8], "little")
        k1 = (k1 * _C1) & _M64
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M64
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    return h1, h2


def combine_ordered(a: tuple[int, int], b: tuple[int, int]) -> tuple[int, int]:
    # combineOrdered over [a, b] starting from (0, 0): a*37 + b per word
    return ((a[0] * 37 + b[0]) & _M64, (a[1] * 37 + b[1]) & _M64)


def _int_hash(i: int) -> tuple[int, int]:
    # getIntHash: murmur of the 4 BIG-endian bytes of i
    return murmur3_x64_128(i.to_bytes(4, "big"))


_INT_HASH_CACHE = [_int_hash(i) for i in range(64)]


def _chars_of(value: int, nchars: int) -> str:
    # big-endian 16-bit units, long0..long3 order
    return "".join(
        chr((value >> (16 * (nchars - 1 - k))) & 0xFFFF) for k in range(nchars)
    )


def _register() -> None:
    """SPI analyzer `simple_minhash` (the reference's documented
    MinHash chain: tokenizer -> 5-shingle -> MinHashFilter —
    minhash/package-info recommends shingling first): SimpleAnalyzer
    base, shingles without unigrams, default 512-bucket rotation-filled
    fingerprints in hex (index-safe terms)."""
    from lucene_spark.analysis.filters import (
        FilteredAnalyzer,
        ShingleFilter,
        SimpleAnalyzer,
        register_analyzer,
    )

    register_analyzer(
        "simple_minhash",
        lambda: FilteredAnalyzer(
            SimpleAnalyzer(),
            [
                ShingleFilter(min_size=5, max_size=5,
                              output_unigrams=False),
                MinHashFilter(),
            ],
            "simple_minhash",
        ),
    )


class MinHashFilter(TokenFilter):
    offsets_safe = False  # collapses the stream to fingerprints

    DEFAULT_HASH_COUNT = 1
    DEFAULT_BUCKET_COUNT = 512
    DEFAULT_HASH_SET_SIZE = 1

    def __init__(
        self,
        hash_count: int = DEFAULT_HASH_COUNT,
        bucket_count: int = DEFAULT_BUCKET_COUNT,
        hash_set_size: int = DEFAULT_HASH_SET_SIZE,
        with_rotation: bool | None = None,
        encoding: str = "hex",
    ):
        if hash_count <= 0 or bucket_count <= 0 or hash_set_size <= 0:
            raise ValueError("hash_count/bucket_count/hash_set_size must be > 0")
        if encoding not in ("hex", "chars"):
            raise ValueError("encoding must be 'hex' or 'chars'")
        self.hash_count = hash_count
        self.bucket_count = bucket_count
        self.hash_set_size = hash_set_size
        # factory default: rotate when bucketCount > 1 (MinHashFilterFactory)
        self.with_rotation = (
            with_rotation if with_rotation is not None else bucket_count > 1
        )
        self.encoding = encoding
        # bucketSize = ceil(2^32 / bucketCount) (MinHashFilter.java:131-134)
        self.bucket_size = (1 << 32) // bucket_count
        if (1 << 32) % bucket_count != 0:
            self.bucket_size += 1

    def _sets(self, tokens: list[str]) -> list[list[list[tuple[int, int]]]]:
        sets: list[list[set]] = [
            [set() for _ in range(self.bucket_count)]
            for _ in range(self.hash_count)
        ]
        for t in tokens:
            base = murmur3_x64_128(t.encode("utf-16-le"))
            for i in range(self.hash_count):
                ih = (
                    _INT_HASH_CACHE[i] if i < len(_INT_HASH_CACHE)
                    else _int_hash(i)
                )
                re1, re2 = combine_ordered(base, ih)
                bucket = (re2 >> 32) // self.bucket_size
                sets[i][int(bucket)].add((re2, re1))  # unsigned (val2, val1)
        # keep the hash_set_size smallest per set
        kept = [
            [sorted(s)[: self.hash_set_size] for s in buckets]
            for buckets in sets
        ]
        if self.with_rotation and self.hash_set_size == 1:
            for i in range(self.hash_count):
                row = kept[i]
                fixed = [list(b) for b in row]
                for j in range(self.bucket_count):
                    if not row[j]:
                        for off in range(1, self.bucket_count):
                            src = row[(j + off) % self.bucket_count]
                            if src:
                                fixed[j] = [src[0]]
                                break
                kept[i] = fixed
        return kept

    def apply(self, tokens: list[str]) -> list[str]:
        if not tokens:
            return []
        kept = self._sets(tokens)
        out: list[str] = []
        for i in range(self.hash_count):
            for bucket in kept[i]:
                for (v2, v1) in bucket:
                    if self.encoding == "chars":
                        # MinHashFilter.java:208-227 char packing; with
                        # multiple hash functions only val1's TOP 32
                        # bits ride along (long0/long1 = x>>48, x>>32)
                        s = ""
                        if self.hash_count > 1:
                            s += _chars_of(i, 2)
                        s += _chars_of(v2, 4)
                        if self.hash_count == 1:
                            s += _chars_of(v1, 4)
                        else:
                            s += chr((v1 >> 48) & 0xFFFF) + chr((v1 >> 32) & 0xFFFF)
                        out.append(s)
                    else:
                        prefix = f"{i:08x}_" if self.hash_count > 1 else ""
                        out.append(f"{prefix}{v2:016x}{v1:016x}")
        return out


_register()
