"""InetAddressPoint + BigIntegerPoint — the two fixed-width 16-byte
point types (core/document/InetAddressPoint.java,
sandbox/document/BigIntegerPoint.java).

Reference semantics: both types pack a value into 16 big-endian bytes
whose UNSIGNED byte order equals the value order — IPv4 addresses are
first mapped into IPv6 space (::ffff:a.b.c.d, InetAddressPoint.encode
at InetAddressPoint.java:170-183), and signed BigIntegers get their
sign bit flipped (NumericUtils.bigIntToSortableBytes). Every query
(newExactQuery / newPrefixQuery / newRangeQuery / newSetQuery) then
reduces to unsigned-byte-range comparisons over that encoding.

Spark mapping: the 16-byte point becomes a 32-char lowercase hex
STRING column — lexicographic string order on fixed-width hex equals
unsigned byte order, so exact/range/CIDR/set queries are plain string
comparisons that Catalyst pushes to the Parquet scan (min/max row-group
pruning on the sorted column plays the BKD role, same as the points
sink). Encoding a column is pure JVM ``format_string`` — no Python in
the scan path. Literals (query side) encode driver-side with the
stdlib ``ipaddress`` module; CIDR prefixes become [network, broadcast]
ranges exactly as newPrefixQuery clears/sets the suffix bits
(InetAddressPoint.java:218-247).
"""

from __future__ import annotations

import ipaddress

from pyspark.sql import Column, functions as F

__all__ = [
    "encode_ip",
    "decode_ip",
    "ip_next_up",
    "ip_next_down",
    "ipv4_hex_column",
    "ip_exact",
    "ip_range",
    "ip_prefix",
    "ip_set",
    "encode_bigint",
    "bigint_hex_column",
    "bigint_exact",
    "bigint_range",
    "bigint_set",
]

# ---------------------------------------------------------------- ip

_V4_PREFIX = "00000000000000000000ffff"  # ::ffff:0:0/96 mapping


def encode_ip(ip: str) -> str:
    """InetAddressPoint.encode (InetAddressPoint.java:170-183): IPv4 ->
    IPv4-mapped IPv6, then 16 big-endian bytes, here as 32 hex chars
    (string order == unsigned byte order)."""
    a = ipaddress.ip_address(ip)
    v = (_V4_PREFIX_INT | int(a)) if a.version == 4 else int(a)
    return format(v, "032x")


_V4_PREFIX_INT = int(_V4_PREFIX, 16) << 32


def decode_ip(hex32: str) -> str:
    """InetAddressPoint.decode: back to the canonical textual form
    (IPv4-mapped values decode to dotted-quad)."""
    v = int(hex32, 16)
    if (v >> 32) == (_V4_PREFIX_INT >> 32):
        return str(ipaddress.IPv4Address(v & 0xFFFFFFFF))
    return str(ipaddress.IPv6Address(v))


def ip_next_up(ip: str) -> str:
    """InetAddressPoint.nextUp(InetAddressPoint.java:89-105): the
    smallest address greater than ``ip`` (errors past MAX_VALUE)."""
    v = int(encode_ip(ip), 16)
    if v == (1 << 128) - 1:
        raise ValueError("cannot nextUp the maximum address")
    return decode_ip(format(v + 1, "032x"))


def ip_next_down(ip: str) -> str:
    """InetAddressPoint.nextDown: the largest address less than it."""
    v = int(encode_ip(ip), 16)
    if v == 0:
        raise ValueError("cannot nextDown the minimum address")
    return decode_ip(format(v - 1, "032x"))


def ipv4_hex_column(dotted: Column) -> Column:
    """Encode a dotted-quad IPv4 string column into the 32-hex point
    form, JVM-side (split + format_string; whole-stage codegen)."""
    parts = F.split(dotted, r"\.")
    return F.format_string(
        _V4_PREFIX + "%02x%02x%02x%02x",
        *[parts.getItem(i).cast("int") for i in range(4)],
    )


def ip_exact(col: Column, ip: str) -> Column:
    """newExactQuery (InetAddressPoint.java:204)."""
    return col == F.lit(encode_ip(ip))


def ip_range(col: Column, lo: str, hi: str) -> Column:
    """newRangeQuery (InetAddressPoint.java:261): both ends inclusive
    (use ip_next_up/ip_next_down for exclusive ends, as the reference
    javadoc prescribes)."""
    return (col >= F.lit(encode_ip(lo))) & (col <= F.lit(encode_ip(hi)))


def ip_prefix(col: Column, ip: str, prefix_len: int) -> Column:
    """newPrefixQuery (InetAddressPoint.java:218-247): CIDR membership
    = the [network, broadcast] range of ``ip/prefix_len`` (IPv4
    prefixes count from the v4 part, as the reference's +96 shift)."""
    a = ipaddress.ip_address(ip)
    net = ipaddress.ip_network((ip, prefix_len), strict=False)
    lo, hi = str(net.network_address), str(net.broadcast_address)
    if a.version == 4 and not (0 <= prefix_len <= 32):
        raise ValueError(f"illegal prefixLength {prefix_len}")
    return ip_range(col, lo, hi)


def ip_set(col: Column, ips: list[str]) -> Column:
    """newSetQuery (InetAddressPoint.java:278)."""
    return col.isin([encode_ip(i) for i in ips])


# ---------------------------------------------------- 128-bit integer

_BIAS = 1 << 127


def encode_bigint(v: int) -> str:
    """BigIntegerPoint.encodeDimension (BigIntegerPoint.java:152 ->
    NumericUtils.bigIntToSortableBytes): two's-complement 128-bit with
    the sign bit flipped — i.e. v + 2^127 unsigned — as 32 hex chars."""
    if not -_BIAS <= v < _BIAS:
        raise ValueError("value out of 128-bit range")
    return format(v + _BIAS, "032x")


def decode_bigint(hex32: str) -> int:
    return int(hex32, 16) - _BIAS


def bigint_hex_column(v: Column) -> Column:
    """Encode a LONG column into the 128-bit sortable-hex form: the
    upper 8 bytes are the sign extension with the top bit flipped
    (7fff.. for negatives, 8000.. otherwise), the lower 8 bytes the
    long's own two's complement (%016x prints it unsigned)."""
    upper = F.when(v < 0, F.lit("7fffffffffffffff")).otherwise(
        F.lit("8000000000000000")
    )
    return F.concat(upper, F.format_string("%016x", v.cast("long")))


def bigint_exact(col: Column, v: int) -> Column:
    """newExactQuery (BigIntegerPoint.java:174)."""
    return col == F.lit(encode_bigint(v))


def bigint_range(col: Column, lo: int, hi: int) -> Column:
    """newRangeQuery (BigIntegerPoint.java:198), both ends inclusive."""
    return (col >= F.lit(encode_bigint(lo))) & (
        col <= F.lit(encode_bigint(hi))
    )


def bigint_set(col: Column, vals: list[int]) -> Column:
    """newSetQuery."""
    return col.isin([encode_bigint(v) for v in vals])


def ip_range_relation(
    lo_col: Column,
    hi_col: Column,
    relation: str,
    lo_ip: str,
    hi_ip: str,
) -> Column:
    """InetAddressRange (core/document/InetAddressRange.java): a STORED
    ip range [lo_col, hi_col] related to the query range [lo_ip, hi_ip]
    — the RangeFieldQuery relation algebra (INTERSECTS / WITHIN /
    CONTAINS / CROSSES = intersects AND NOT within) evaluated on the
    16-byte sortable-hex encoding, where byte order == string order, so
    every relation is a flat codegen conjunction of string compares."""
    qlo, qhi = encode_ip(lo_ip), encode_ip(hi_ip)
    if qlo > qhi:
        raise ValueError("min value cannot be greater than max")
    inter = (lo_col <= F.lit(qhi)) & (hi_col >= F.lit(qlo))
    within = (lo_col >= F.lit(qlo)) & (hi_col <= F.lit(qhi))
    contains = (lo_col <= F.lit(qlo)) & (hi_col >= F.lit(qhi))
    if relation == "intersects":
        return inter
    if relation == "within":
        return within
    if relation == "contains":
        return contains
    if relation == "crosses":
        return inter & ~within
    raise ValueError(f"unknown relation {relation!r}")
