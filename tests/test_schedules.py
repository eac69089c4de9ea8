"""Tests for the LR schedules against the closed-form SGDR formula
(warm_restarts_lr.py:56-63) and torch plateau semantics."""

import math

import pytest

from deepfluoro_tpu.train.schedules import ReduceLROnPlateau, WarmRestartLR


class TestWarmRestartLR:
    def test_initial_lr_is_base(self):
        s = WarmRestartLR(0.1, init_run_period_epochs=10)
        assert s.get_lr() == pytest.approx(0.1)

    def test_cosine_formula(self):
        base, period = 0.1, 10
        s = WarmRestartLR(base, init_run_period_epochs=period)
        for epoch in range(period):
            for ratio in (0.0, 0.25, 0.5, 0.99):
                s.cur_epoch_ratio = ratio
                want = 0.5 * base * (1 + math.cos(math.pi * (epoch + ratio) / period))
                assert s.get_lr() == pytest.approx(want), (epoch, ratio)
            s.cur_epoch_ratio = 0.0
            s.step()

    def test_restart_and_growth(self):
        s = WarmRestartLR(0.1, init_run_period_epochs=4, growth_factor=2)
        restarts = []
        for epoch in range(1, 29):
            s.step()
            if s.just_restarted:
                restarts.append(epoch)
        # periods 4, 8, 16 -> restarts after epochs 4, 12, 28
        assert restarts == [4, 12, 28]
        assert s.cur_run_period_epochs == 32

    def test_lr_resets_to_base_after_restart(self):
        s = WarmRestartLR(0.1, init_run_period_epochs=4)
        for _ in range(4):
            s.step()
        assert s.just_restarted
        assert s.get_lr() == pytest.approx(0.1)

    def test_intra_epoch_step_returns_lr(self):
        s = WarmRestartLR(0.2, init_run_period_epochs=10)
        lr = s.intra_epoch_step(0.5)
        want = 0.5 * 0.2 * (1 + math.cos(math.pi * 0.5 / 10))
        assert lr == pytest.approx(want)

    def test_state_roundtrip(self):
        s = WarmRestartLR(0.1, init_run_period_epochs=4)
        for _ in range(6):
            s.step()
        s2 = WarmRestartLR(0.9, init_run_period_epochs=99)
        s2.load_state_dict(s.state_dict())
        assert s2.get_lr() == pytest.approx(s.get_lr())
        assert s2.next_restart_epoch == s.next_restart_epoch


class TestPlateau:
    def test_reduces_after_patience(self):
        s = ReduceLROnPlateau(1.0, factor=0.1, patience=2, cooldown=0)
        s.step(1.0)  # best=1.0
        assert s.get_lr() == 1.0
        for _ in range(2):
            s.step(1.0)  # bad epochs 1, 2
        assert s.get_lr() == 1.0
        s.step(1.0)  # bad 3 > patience -> reduce
        assert s.get_lr() == pytest.approx(0.1)

    def test_improvement_resets(self):
        s = ReduceLROnPlateau(1.0, factor=0.1, patience=2, cooldown=0)
        s.step(1.0)
        s.step(1.0)
        s.step(0.5)  # improvement
        s.step(0.5)
        s.step(0.5)
        assert s.get_lr() == 1.0  # only 2 bad epochs since improvement

    def test_cooldown_suppresses(self):
        s = ReduceLROnPlateau(1.0, factor=0.1, patience=0, cooldown=3)
        s.step(1.0)
        s.step(1.0)  # reduce immediately (patience 0)
        assert s.get_lr() == pytest.approx(0.1)
        lr_after = s.get_lr()
        for _ in range(3):
            s.step(1.0)  # inside cooldown, no further reduction
        assert s.get_lr() == pytest.approx(lr_after)

    def test_state_roundtrip(self):
        s = ReduceLROnPlateau(1.0, patience=1)
        s.step(0.7)
        s.step(0.9)
        s2 = ReduceLROnPlateau(5.0)
        s2.load_state_dict(s.state_dict())
        assert s2.get_lr() == s.get_lr()
        assert s2.best == s.best
