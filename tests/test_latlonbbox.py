"""LatLonBoundingBox (sandbox/document/LatLonBoundingBox.java):
quantized box relations vs brute-force replay; encode contract vs
GeoEncodingUtils semantics."""

import math

import numpy as np
import pytest

from lucene_spark.search import latlonbbox as llb

SF_DIR = "/root/testdata/sf0.001"


def test_encode_contract():
    # floor toward -90/-180; maxima nudge to 2^31-1 (nextDown overflow)
    assert llb.encode_latitude(90.0) == 2**31 - 1
    assert llb.encode_longitude(180.0) == 2**31 - 1
    assert llb.encode_latitude(-90.0) == -(2**31)
    assert llb.encode_longitude(-180.0) == -(2**31)
    assert llb.encode_latitude(0.0) == 0
    # quantization rounds DOWN: a value between grid lines floors
    e = llb.encode_latitude(1e-9)
    assert e == 0
    assert llb.encode_latitude(-1e-9) == -1


def test_check_args():
    with pytest.raises(ValueError, match="minLon"):
        llb.check_args(0.0, 10.0, 5.0, -10.0)  # dateline wrap
    with pytest.raises(ValueError, match="minLat"):
        llb.check_args(10.0, 0.0, 5.0, 5.0)  # pole crossing


def test_relations_match_bruteforce(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    boxes = llb.synthesize_boxes(docs)
    pdf = boxes.toPandas()
    elat = np.array([llb.encode_latitude(v) for v in pdf.min_lat])
    elat_x = np.array([llb.encode_latitude(v) for v in pdf.max_lat])
    elon = np.array([llb.encode_longitude(v) for v in pdf.min_lon])
    elon_x = np.array([llb.encode_longitude(v) for v in pdf.max_lon])

    q = (10.0, -40.0, 55.0, 60.0)
    qlat = (llb.encode_latitude(q[0]), llb.encode_latitude(q[2]))
    qlon = (llb.encode_longitude(q[1]), llb.encode_longitude(q[3]))

    inter = (elat <= qlat[1]) & (elat_x >= qlat[0]) & \
            (elon <= qlon[1]) & (elon_x >= qlon[0])
    within = (elat >= qlat[0]) & (elat_x <= qlat[1]) & \
             (elon >= qlon[0]) & (elon_x <= qlon[1])
    contains = (elat <= qlat[0]) & (elat_x >= qlat[1]) & \
               (elon <= qlon[0]) & (elon_x >= qlon[1])
    crosses = inter & ~within

    for rel, mask in [("intersects", inter), ("within", within),
                      ("contains", contains), ("crosses", crosses)]:
        got = llb.bbox_query_topk(boxes, rel, *q, k=100000).toPandas()
        want = set(pdf.doc_id[mask])
        assert set(got.doc_id) == want, rel
    # partition identity: intersects = within + contains-ish overlap;
    # at minimum crosses and within partition intersects
    assert (crosses | within).sum() == inter.sum()


def test_quantization_is_shared_between_sides(spark):
    # a stored box whose raw max_lat is just BELOW the query min still
    # matches when both quantize to the same grid cell
    df = spark.createDataFrame(
        [(1, 9.9999999, -10.0, 9.99999995, 10.0)],
        "doc_id long, min_lat double, min_lon double, "
        "max_lat double, max_lon double",
    )
    # both 9.9999999 and 9.99999995 floor to the same encoded int; a
    # query starting at that same grid line intersects
    lo = llb.encode_latitude(9.9999999)
    q_min_lat = lo / llb.LAT_SCALE  # a degree value on the grid line
    got = llb.bbox_query_topk(
        df, "intersects", q_min_lat, -20.0, 50.0, 20.0, k=10
    ).toPandas()
    assert got.doc_id.tolist() == [1]
