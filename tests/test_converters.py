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


_QFIT_NAME = "ILATM1B_20140401_123045.ATM4BT4.h5"
# reference regex needs the ATM1B token and _YYYYMMDD_HHMMSS_


def test_qfit_plain_layout_days_j2k():
    n = 4
    data = {
        "latitude": np.arange(n) + 70.0,
        "longitude": np.arange(n) - 50.0,
        "elevation": np.arange(n) * 2.0,
        "instrument_parameters/azimuth": np.arange(n) * 90.0,
        "instrument_parameters/rel_time": np.array([0.0, 1.0, 2.0, 3.0]),
    }
    f = converters.qfit_frame(data, _QFIT_NAME, waveform_format=False)
    assert list(f.columns) == ["latitude", "longitude", "elevation",
                               "azimuth", "rel_time", "days_J2K"]
    # t0 = 2014-04-01 12:30:45 minus 2000-01-01, fractional days
    from datetime import datetime
    t0 = datetime(2014, 4, 1, 12, 30, 45) - datetime(2000, 1, 1)
    t0 = t0.days + t0.seconds / 86400.0
    assert np.allclose(f.days_J2K, data[
        "instrument_parameters/rel_time"] / 86400.0 + t0)


def test_qfit_waveform_layout_days_j2k():
    n = 3
    data = {
        "footprint/latitude": np.arange(n) + 70.0,
        "footprint/longitude": np.arange(n) - 50.0,
        "footprint/elevation": np.arange(n) * 2.0,
        "time/seconds_of_day": np.array([3600.0, 7200.0, 10800.0]),
    }
    f = converters.qfit_frame(data, _QFIT_NAME, waveform_format=True)
    assert list(f.columns) == ["latitude", "longitude", "elevation",
                               "seconds_of_day", "days_J2K"]
    # waveform t0 is the DATE only — HMS in the filename is ignored
    from datetime import date
    day0 = (date(2014, 4, 1) - date(2000, 1, 1)).days
    assert np.allclose(f.days_J2K,
                       day0 + data["time/seconds_of_day"] / 86400.0)


def test_qfit_filename_time_rejects_garbage():
    import pytest
    with pytest.raises(ValueError):
        converters.qfit_filename_time("notes.txt")


def test_h5_converters_are_ungated(spark):
    """The converter I/O layer is live (stdlib codec, sources/hdf5.py):
    a missing granule fails as a plain file error, not a dependency
    gate. End-to-end conversion is covered in tests/test_hdf5.py."""
    import pytest
    with pytest.raises(FileNotFoundError):
        converters.convert_atl06(spark, "/nonexistent.h5", "/tmp/o", 1, 1)
    with pytest.raises(FileNotFoundError):
        converters.convert_qfit(spark, "/nonexistent.h5", "/tmp/o")
