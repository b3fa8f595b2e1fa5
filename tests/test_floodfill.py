"""Flood-fill / connectivity tests (reference FloodFill, Deff2D.cuh:557-713):
4-connectivity, periodic wrap in Y, boundary seeding, isolated-pore marking,
percolation flag; host and on-device variants must agree."""

import numpy as np
import pytest

from effectivediffusivityfvm_tpu.models.floodfill import (
    flood_fill,
    participating_mask_device,
)


def grid(rows):
    """'#' = solid, '.' = fluid."""
    return np.array([[ch == "#" for ch in r] for r in rows])


class TestFloodFill:
    def test_open_channel_percolates(self):
        solid = grid([
            "####",
            "....",
            "####",
        ])
        r = flood_fill(solid)
        assert r.path_flag
        assert r.participating[1].all()
        assert not r.isolated.any()

    def test_blocked_channel_no_percolation(self):
        solid = grid([
            ".#..",
            ".#..",
            ".#..",
        ])
        r = flood_fill(solid)
        assert not r.path_flag
        # both sides still participate (seeded from both boundaries,
        # Deff2D.cuh:593-605 intent)
        assert r.participating[:, 0].all()
        assert r.participating[:, 2:].all()
        assert not r.isolated.any()

    def test_isolated_pore_marked(self):
        solid = grid([
            "#####",
            "#...#",
            "#####",
        ])
        r = flood_fill(solid)
        assert not r.path_flag
        assert r.isolated[1, 1:4].all()          # Grid==2 equivalent
        assert not r.participating.any()

    def test_periodic_y_connects_top_bottom(self):
        # A path that requires wrapping: fluid touches left boundary only on
        # the top row; reaches the right boundary only via the bottom row
        # through the periodic N/S neighbors (Deff2D.cuh:640-671).
        solid = grid([
            ".####",
            "#####",
            "....#",   # dead-end unless wrapped? no — connect via column 0? blocked by row1
        ])
        # column 0: row0 fluid, row1 solid, row2 fluid; periodic wrap connects
        # row2 <-> row0 through the Y boundary at column 0.
        r = flood_fill(solid)
        assert r.participating[2, 0]
        assert r.participating[0, 0]

    def test_no_periodicity_in_x(self):
        solid = grid([
            ".#.",
        ])
        r = flood_fill(solid)
        # left and right cells are NOT neighbors through the X boundary;
        # single row: each is its own boundary-connected component
        assert not r.path_flag
        assert r.participating[0, 0] and r.participating[0, 2]

    def test_diagonals_not_connected(self):
        solid = grid([
            ".#",
            "#.",
        ])
        r = flood_fill(solid)
        # (0,0) touches left boundary; (1,1) touches right; 4-connectivity
        # means no diagonal link... but periodic Y makes (0,0)-(1,0)? (1,0) is
        # solid. (0,1) solid. So two separate single-cell components.
        assert not r.path_flag

    def test_all_fluid(self):
        r = flood_fill(np.zeros((4, 5), bool))
        assert r.path_flag
        assert r.participating.all()

    def test_all_solid(self):
        r = flood_fill(np.ones((4, 5), bool))
        assert not r.path_flag
        assert not r.participating.any()
        assert not r.isolated.any()


class TestDeviceVariant:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_matches_host_on_random_media(self, seed):
        rng = np.random.default_rng(seed)
        solid = rng.random((24, 16)) < 0.45
        host = flood_fill(solid)
        part, iso, flag = participating_mask_device(solid)
        np.testing.assert_array_equal(np.asarray(part), host.participating)
        np.testing.assert_array_equal(np.asarray(iso), host.isolated)
        assert bool(flag) == host.path_flag

    def test_matches_host_periodic_case(self):
        solid = grid([
            ".####",
            "#####",
            "....#",
        ])
        host = flood_fill(solid)
        part, iso, flag = participating_mask_device(solid)
        np.testing.assert_array_equal(np.asarray(part), host.participating)
        assert bool(flag) == host.path_flag


class TestNative:
    """C++ union-find library (csrc/preprocess.cpp) vs the scipy reference."""

    def _native_or_skip(self):
        from effectivediffusivityfvm_tpu.models import _native

        if not _native.native_available():
            pytest.skip("native preprocess library unavailable (no g++?)")
        return _native

    @pytest.mark.parametrize("seed", range(6))
    def test_flood_fill_matches_scipy(self, seed):
        nat = self._native_or_skip()
        rng = np.random.default_rng(seed)
        solid = rng.random((37, 53)) < [0.3, 0.45, 0.6][seed % 3]
        part, iso, flag = nat.flood_fill_native(solid)
        host = flood_fill(solid, use_native=False)
        np.testing.assert_array_equal(part, host.participating)
        np.testing.assert_array_equal(iso, host.isolated)
        assert flag == host.path_flag

    def test_porosity_and_classify(self):
        nat = self._native_or_skip()
        from effectivediffusivityfvm_tpu.models import phases

        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (64, 48), dtype=np.uint8)
        assert nat.porosity_native(img) == pytest.approx(phases.porosity(img))
        np.testing.assert_array_equal(
            nat.classify_two_phase_native(img), phases.two_phase_classes(img))
        np.testing.assert_array_equal(
            nat.classify_three_phase_native(img), phases.three_phase_classes(img))

    def test_edge_cases(self):
        nat = self._native_or_skip()
        for solid in (np.zeros((3, 3), bool), np.ones((3, 3), bool),
                      np.zeros((1, 5), bool), np.zeros((5, 1), bool)):
            part, iso, flag = nat.flood_fill_native(solid)
            host = flood_fill(solid, use_native=False)
            np.testing.assert_array_equal(part, host.participating)
            assert flag == host.path_flag
