"""Label codec unit tests against the executable spec
(/root/reference/data_process/get_data_SegMM_public.py:45-89)."""

import numpy as np
import pytest

from segmminterest_tpu.data.labels import (construct_label_1d, frame_count,
                                           pad_label, parse_label_1d)


def reference_label(duration_ms, playing_time):
    """Direct transliteration of the spec for oracle comparison."""
    size = len(range(0, int(duration_ms), 5000))
    if playing_time >= duration_ms:
        return np.full(size, 1)
    label = np.full(size, -1)
    play = [int(i / 1000) for i in range(0, int(playing_time), 5000)]
    label[int(play[-1] / 5)] = 0
    label[: int(play[-1] / 5)] = 1
    return label


@pytest.mark.parametrize("duration,playing", [
    (32366, 1623),     # sample row 1: leave at segment 0
    (7366, 2877),
    (13866, 4230),
    (10000, 1455),
    (199999, 199998),  # just under the duration filter edge
    (199999, 250000),  # completed view (play >= duration)
    (5000, 1),         # minimal play
    (5001, 5000),      # leave exactly at the first boundary
    (5001, 5001),      # completed
    (100000, 55000),   # mid-video leave
    (100000, 54999),
])
def test_label_matches_reference(duration, playing):
    got = construct_label_1d(duration, playing)
    want = reference_label(duration, playing)
    np.testing.assert_array_equal(got, want)


def test_frame_count():
    assert frame_count(5000) == 1
    assert frame_count(5001) == 2
    assert frame_count(199999) == 40
    assert frame_count(1) == 1


def test_completed_view_has_no_leave_slot():
    lab = construct_label_1d(20000, 20000)
    assert (lab == 1).all() and len(lab) == 4


def test_parse_and_pad_roundtrip():
    parsed = parse_label_1d("[ 1  1  0 -1 -1]")
    assert parsed == [1, 1, 0, -1, -1]
    padded = pad_label(parsed, max_length=8)
    np.testing.assert_array_equal(padded, [1, 1, 0, -1, -1, -2, -2, -2])
    # truncation at 40 (dataloader_SegMM.py:243-244)
    long = [1] * 50
    assert len(pad_label(long)) == 40


def test_sample_csv_rows_parse():
    import pandas as pd
    df = pd.read_csv("/root/reference/SegMM_inter_sample.csv", nrows=200)
    for _, row in df.iterrows():
        lab = parse_label_1d(row["label_1D"])
        assert len(lab) == frame_count(row["duration_ms"])
        # labels reconstructed from duration/playing match the published ones
        rebuilt = construct_label_1d(row["duration_ms"], row["playing_time"])
        np.testing.assert_array_equal(np.asarray(lab), rebuilt)
