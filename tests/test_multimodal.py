"""Resize/frame-sample plumbing (extensions/multimodal.py). The oracle
differential pins the plan entries; these pin the payload-moving seam
and the plan/execute agreement."""

from __future__ import annotations

import pyspark.sql.functions as F

from bread_spark.extensions.multimodal import (
    RESIZE_MAX_H,
    RESIZE_MAX_W,
    media_from_documents,
    media_resize_plan,
    resize_media,
    set_resizer,
)
from tests.conftest import SF_DIR


def test_resize_never_upscales_and_preserves_aspect(spark):
    plan = media_resize_plan(spark, SF_DIR).collect()
    assert plan
    for r in plan:
        assert 1 <= r["out_w"] <= min(r["width"], RESIZE_MAX_W)
        assert 1 <= r["out_h"] <= min(r["height"], RESIZE_MAX_H)
        # aspect preserved to floor precision: out_w/out_h within one
        # pixel step of width/height's ratio
        if r["width"] <= RESIZE_MAX_W and r["height"] <= RESIZE_MAX_H:
            assert (r["out_w"], r["out_h"]) == (r["width"], r["height"])
        else:
            assert abs(r["out_w"] * r["height"] - r["out_h"] * r["width"]) <= max(
                r["width"], r["height"]
            )


def test_resize_media_agrees_with_plan_and_runs_seam(spark):
    media = media_from_documents(spark, SF_DIR)
    plan = {
        r["media_id"]: (r["out_w"], r["out_h"])
        for r in media_resize_plan(spark, SF_DIR).collect()
    }
    rows = resize_media(media).collect()
    assert {r["media_id"] for r in rows} == set(plan)
    for r in rows:
        assert (r["out_w"], r["out_h"]) == plan[r["media_id"]]
        # the fake resampler sizes payload by target area
        assert len(r["payload"]) == max(1, (r["out_w"] * r["out_h"]) // 256)


def test_resizer_seam_is_pluggable(spark):
    media = media_from_documents(spark, SF_DIR).limit(6)
    try:
        set_resizer(lambda payload, w, h: b"\x00" * 4)
        rows = resize_media(media).collect()
        assert rows and all(r["payload"] == b"\x00" * 4 for r in rows)
    finally:
        from bread_spark.extensions import multimodal as M

        set_resizer(M._fake_resize)


def test_frame_samples_schedule_is_stride_30(spark):
    from bread_spark.extensions.multimodal import FRAME_EVERY_N, media_frame_samples

    rows = media_frame_samples(spark, SF_DIR).collect()
    assert rows
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    for media_id, rs in by_media.items():
        n = rs[0]["n_frames"]
        assert sorted(r["frame_idx"] for r in rs) == list(
            range(0, n, FRAME_EVERY_N)
        ), media_id
