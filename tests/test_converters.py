"""S2 converter transform layer: beam-pair → tidy LR rows, fill→NULL,
field-dict flattening, derived columns (ATL06_data.py:82-206 parity)."""

from __future__ import annotations

import numpy as np

from pointdatabase_spark.sources import converters


def _fake_atl06() -> dict[str, np.ndarray]:
    data = {}
    for p in (1, 2):          # pair 3 missing entirely → skipped
        for side in "lr":
            beam = f"gt{p}{side}"
            n = 5
            data[f"{beam}/latitude"] = np.arange(n) + p * 10.0
            data[f"{beam}/longitude"] = np.arange(n) - 45.0
            data[f"{beam}/h_li"] = np.array([1.0, -9999.0, 3.0, 4.0, 5.0])
            data[f"{beam}/delta_time"] = np.arange(n) * 1.0
            data[f"{beam}/segment_id"] = np.arange(n) * 1.0
            data[f"{beam}/h_li_sigma"] = np.ones(n)
            data[f"{beam}/atl06_quality_summary"] = np.zeros(n)
            data[f"{beam}/ground_track/x_atc"] = np.arange(n) * 20.0
            # y_atc / fit_statistics absent → NULL-filled columns
    return data


def test_atl06_frame_tidy_layout(spark):
    frame = converters.atl06_frame(_fake_atl06(), rgt=77, cycle_number=3)
    # 2 pairs × 2 beams × 5 rows
    assert len(frame) == 20
    assert set(frame.BP.unique()) == {1, 2}
    assert set(frame.LR.unique()) == {0, 1}
    # fill → NaN
    assert frame.h_li.isna().sum() == 4      # one per beam
    # absent field → all-NaN column present
    assert frame.y_atc.isna().all()
    assert (frame.rgt == 77).all() and (frame.cycle_number == 3).all()
    assert (frame.sigma_geo_r == 0.03).all()

    df = converters.ingest_frame(spark, frame, "ATL06_fake.h5")
    # NaN became NULL (Catalyst-skippable), provenance carried
    assert df.where("h_li IS NULL").count() == 4
    assert df.select("source_file").first()[0] == "ATL06_fake.h5"
    assert df.count() == 20


def test_flatten_field_dict_paths():
    flat = converters.flatten_field_dict(
        {None: ["a"], "g": ["b", "c"]})
    assert flat == [("a", "a"), ("g/b", "b"), ("g/c", "c")]
