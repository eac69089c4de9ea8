"""Tests for utility kit: float writers, step timer."""

import pytest

from deepfluoro_tpu.utils.io import (
    RunningFloatWriter,
    read_floats_from_txt,
    write_floats_to_txt,
)
from deepfluoro_tpu.utils.profiling import StepTimer


class TestFloatIO:
    def test_write_read_roundtrip(self, tmp_path):
        p = str(tmp_path / "f.txt")
        write_floats_to_txt(p, [1.5, -0.25, 3.0])
        assert read_floats_from_txt(p) == [1.5, -0.25, 3.0]

    def test_format_contract(self, tmp_path):
        # '{:.6f}' lines (util.py:56,73)
        p = str(tmp_path / "f.txt")
        with RunningFloatWriter(p) as w:
            w.write(0.123456789)
        assert open(p).read() == "0.123457\n"

    def test_append_mode(self, tmp_path):
        p = str(tmp_path / "f.txt")
        with RunningFloatWriter(p) as w:
            w.write(1.0)
        with RunningFloatWriter(p, new_file=False) as w:
            w.write(2.0)
        assert read_floats_from_txt(p) == [1.0, 2.0]

    def test_flushed_per_line(self, tmp_path):
        p = str(tmp_path / "f.txt")
        w = RunningFloatWriter(p)
        w.write(7.0)
        # visible before close (util.py:74 flush)
        assert read_floats_from_txt(p) == [7.0]
        w.close()


class TestStepTimer:
    def test_measure_and_summary(self):
        t = StepTimer()
        for _ in range(10):
            with t.measure():
                pass
        s = t.summary()
        assert s["count"] == 10
        assert s["mean_s"] >= 0
        assert s["p95_s"] >= s["p50_s"] >= 0

    def test_empty(self):
        assert StepTimer().summary() == {"count": 0}
