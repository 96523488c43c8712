"""InetAddressPoint / BigIntegerPoint — sortable hex encodings and the
exact/range/CIDR/set queries (core/document/InetAddressPoint.java,
sandbox/document/BigIntegerPoint.java; TestInetAddressPoint /
TestBigIntegerPoint patterns). Literal encodes are checked against the
stdlib ipaddress module; column encodes against the literal encoder."""

import ipaddress

import pandas as pd
import pytest

from lucene_spark.search import ippoint as IP


def test_encode_ipv4_mapped():
    # reference encode: IPv4 -> ::ffff:a.b.c.d, 16 bytes
    assert IP.encode_ip("1.2.3.4") == (
        "00000000000000000000ffff01020304"
    )
    assert IP.decode_ip(IP.encode_ip("1.2.3.4")) == "1.2.3.4"


def test_encode_ipv6_roundtrip():
    for ip in ["::1", "2001:db8::8:800:200c:417a", "fe80::1234"]:
        got = IP.encode_ip(ip)
        assert int(got, 16) == int(ipaddress.ip_address(ip))
        assert ipaddress.ip_address(IP.decode_ip(got)) == (
            ipaddress.ip_address(ip)
        )


def test_order_preservation():
    ips = ["1.2.3.4", "1.2.3.5", "9.0.0.0", "10.0.0.0", "::1",
           "2001:db8::1", "255.255.255.255"]
    by_hex = sorted(ips, key=IP.encode_ip)
    # v6-mapped v4 sits above ::1 and below 2001:db8::1
    def key(ip):
        a = ipaddress.ip_address(ip)
        return int(a) | (0xFFFF << 32) if a.version == 4 else int(a)
    assert by_hex == sorted(ips, key=key)


def test_next_up_down():
    assert IP.ip_next_up("1.2.3.4") == "1.2.3.5"
    assert IP.ip_next_down("1.2.4.0") == "1.2.3.255"
    # rolling past the v4 octet boundary
    assert IP.ip_next_up("1.2.255.255") == "1.3.0.0"
    with pytest.raises(ValueError):
        IP.ip_next_down("::")


def test_column_encode_matches_literal(spark):
    ips = ["1.2.3.4", "10.0.0.1", "192.168.255.254", "0.0.0.0",
           "255.255.255.255"]
    df = spark.createDataFrame(pd.DataFrame({"ip": ips}))
    got = df.select(IP.ipv4_hex_column(df.ip).alias("h")).toPandas()
    assert got["h"].tolist() == [IP.encode_ip(i) for i in ips]


def test_queries(spark):
    ips = [f"10.0.{i // 256}.{i % 256}" for i in range(600)]
    df = spark.createDataFrame(pd.DataFrame({"i": range(600), "ip": ips}))
    h = IP.ipv4_hex_column(df.ip)
    assert df.filter(IP.ip_exact(h, "10.0.1.44")).toPandas()[
        "i"
    ].tolist() == [300]
    got = df.filter(IP.ip_range(h, "10.0.0.100", "10.0.1.44")).count()
    assert got == 201
    # CIDR /24 over 10.0.1.0 -> i in [256, 511]
    cid = df.filter(IP.ip_prefix(h, "10.0.1.7", 24)).toPandas()["i"]
    assert cid.min() == 256 and cid.max() == 511 and len(cid) == 256
    st = df.filter(IP.ip_set(h, ["10.0.0.5", "10.0.2.77", "8.8.8.8"]))
    assert sorted(st.toPandas()["i"]) == [5, 589]


def test_bigint_encode():
    assert IP.encode_bigint(0) == "8" + "0" * 31
    assert IP.encode_bigint(-1) == "7" + "f" * 31
    assert IP.decode_bigint(IP.encode_bigint(-(1 << 100))) == -(1 << 100)
    vals = [-(1 << 127), -5, 0, 7, (1 << 127) - 1]
    assert sorted(vals, key=IP.encode_bigint) == vals
    with pytest.raises(ValueError):
        IP.encode_bigint(1 << 127)


def test_bigint_column_and_queries(spark):
    vals = [-(2**62), -12345, -1, 0, 1, 99999, 2**62]
    df = spark.createDataFrame(pd.DataFrame({"v": vals}))
    h = IP.bigint_hex_column(df.v)
    got = df.select(h.alias("h")).toPandas()["h"].tolist()
    assert got == [IP.encode_bigint(v) for v in vals]
    assert df.filter(IP.bigint_exact(h, -12345)).count() == 1
    rng = df.filter(IP.bigint_range(h, -12345, 1)).toPandas()["v"]
    assert sorted(rng) == [-12345, -1, 0, 1]
    st = df.filter(IP.bigint_set(h, [0, 2**62, 123]))
    assert sorted(st.toPandas()["v"]) == [0, 2**62]
