"""I/O tests: input.txt parsing, CSV schema parity, CMAP roundtrip,
incremental batch writer resume."""

import os

import numpy as np
import pytest

from effectivediffusivityfvm_tpu.config import SimulationConfig, parse_input_file, format_options
from effectivediffusivityfvm_tpu.io import writers
from effectivediffusivityfvm_tpu.io.images import load_grayscale, batch_filenames
from effectivediffusivityfvm_tpu.viz import read_cmap


class TestInputFile:
    def test_parses_reference_input_txt(self, reference_dir):
        cfg = parse_input_file(os.path.join(reference_dir, "input.txt"))
        assert cfg.n_phase == 3
        assert cfg.d_solid == 0.0
        assert cfg.d_fluid == 1.0
        assert cfg.d_gas == 1_237_500.0
        assert cfg.mesh_amp_x == 1 and cfg.mesh_amp_y == 1
        assert cfg.input_name == "00042.jpg"
        assert cfg.c_right == 1.0 and cfg.c_left == 0.0
        assert cfg.output_name == "singleTest.csv"
        assert cfg.print_cmap is True
        assert cfg.cmap_name == "CMAP_00042.csv"
        assert cfg.convergence == 1e-5
        assert cfg.max_iter == 500_000
        assert cfg.verbose is True
        assert cfg.batch_flag is False
        assert cfg.num_images == 500

    def test_unknown_keys_ignored(self, tmp_path):
        p = tmp_path / "in.txt"
        p.write_text("Bogus: 12\nDf: 3.5\n\nPhases: 2\n")
        cfg = parse_input_file(str(p))
        assert cfg.d_fluid == 3.5
        assert cfg.n_phase == 2

    def test_scientific_notation(self, tmp_path):
        p = tmp_path / "in.txt"
        p.write_text("Convergence: 1e-7\nMaxIter: 5e5\nPhases: 2\n")
        cfg = parse_input_file(str(p))
        assert cfg.convergence == 1e-7
        assert cfg.max_iter == 500_000

    def test_tpu_extension_keys(self, tmp_path):
        p = tmp_path / "in.txt"
        p.write_text("Phases: 2\nSolver: cg\nDtype: float64\nCheckEvery: 100\n")
        cfg = parse_input_file(str(p))
        assert cfg.solver == "cg"
        assert cfg.dtype == "float64"
        assert cfg.check_every == 100

    def test_first_window_key(self, tmp_path):
        p = tmp_path / "in.txt"
        p.write_text("Phases: 2\nSolver: mgcg\nFirstWindow: 40\n")
        cfg = parse_input_file(str(p))
        assert cfg.first_window == 40
        cfg.validate()
        # default is 0 = auto (criterion-based, resolved in the solver)
        assert SimulationConfig().first_window == 0
        import dataclasses
        import pytest
        with pytest.raises(ValueError, match="FirstWindow"):
            dataclasses.replace(SimulationConfig(), first_window=-1).validate()

    def test_format_options_runs(self):
        assert "Number of Phases = 2" in format_options(SimulationConfig())


class TestImages:
    def test_load_bundled_2phase(self, reference_dir):
        img = load_grayscale(os.path.join(reference_dir, "00000.jpg"))
        assert img.shape == (128, 128)
        assert img.dtype == np.uint8

    def test_load_bundled_3phase(self, reference_dir):
        img = load_grayscale(os.path.join(reference_dir, "00042.jpg"))
        assert img.shape == (2007, 1002)

    def test_batch_filenames(self):
        names = batch_filenames(3, "/data")
        assert names == ["/data/00000.jpg", "/data/00001.jpg", "/data/00002.jpg"]


class TestWriters:
    def test_single_schema(self, tmp_path):
        p = tmp_path / "out.csv"
        writers.write_single(str(p), "a.jpg", 0.5, 1, 0.123, 1.5, 16384, 1e-6, 0.001, 1.0)
        lines = p.read_text().splitlines()
        assert lines[0] == writers.BATCH2_HEADER
        assert lines[1].startswith("a.jpg,0.500000,1,0.123000,1.500000,16384,")

    def test_single_appends_header_each_call(self, tmp_path):
        # reference parity: fopen("a+") + header before every row
        # (Deff2D.cuh:182-184)
        p = tmp_path / "out.csv"
        writers.write_single(str(p), "a.jpg", 0.5, 1, 0.1, 1.0, 10, 1e-6, 0.0, 1.0)
        writers.write_single(str(p), "b.jpg", 0.4, 0, 0.2, 2.0, 10, 1e-6, 0.0, 1.0)
        lines = p.read_text().splitlines()
        assert lines[0] == lines[2] == writers.BATCH2_HEADER

    def test_3phase_schema(self, tmp_path):
        p = tmp_path / "out.csv"
        writers.write_single_3phase(str(p), "c.jpg", 0.3, 0.4, 1, 371250.4, 9.0,
                                    2011014, -1e-6, 0.0, 1.0, 1237500.0)
        lines = p.read_text().splitlines()
        assert lines[0] == writers.BATCH3_HEADER
        assert "3.713e+05" in lines[1]
        assert "1.238e+06" in lines[1]  # %1.3e of 1237500

    def test_batch_schema(self, tmp_path):
        p = tmp_path / "b.csv"
        rows = [(0, 0.5, 1, 0.1, 1.0, 100, 1e-6, 0.0, 1.0),
                (1, 0.6, 0, 0.2, 2.0, 100, 1e-6, 0.0, 1.0)]
        writers.write_batch(str(p), rows)
        lines = p.read_text().splitlines()
        assert len(lines) == 3
        assert lines[1].startswith("0,0.500000,1,")

    def test_cmap_roundtrip(self, tmp_path):
        p = tmp_path / "cmap.csv"
        rng = np.random.default_rng(0)
        field = rng.random((5, 7))
        writers.write_cmap(str(p), field)
        lines = p.read_text().splitlines()
        assert lines[0] == "X,Y,C"
        assert len(lines) == 1 + 35
        back = read_cmap(str(p))
        np.testing.assert_allclose(back, field, rtol=1e-3)  # %1.3e precision

    def test_incremental_resume(self, tmp_path):
        p = tmp_path / "inc.csv"
        w = writers.IncrementalBatchWriter(str(p))
        assert w.completed() == set()
        w.write_row((0, 0.5, 1, 0.1, 1.0, 100, 1e-6, 0.0, 1.0))
        w.write_row((1, 0.6, 0, 0.2, 2.0, 100, 1e-6, 0.0, 1.0))
        w2 = writers.IncrementalBatchWriter(str(p))
        assert w2.completed() == {0, 1}
        w2.write_row((2, 0.7, 1, 0.3, 3.0, 100, 1e-6, 0.0, 1.0))
        assert writers.IncrementalBatchWriter(str(p)).completed() == {0, 1, 2}

    def test_incremental_resume_out_of_order(self, tmp_path):
        """Out-of-index-order completion (shape-sorted groups) must not make
        resume skip earlier indices (round-1 verdict #6)."""
        p = tmp_path / "inc.csv"
        w = writers.IncrementalBatchWriter(str(p))
        w.write_row((2, 0.5, 1, 0.1, 1.0, 100, 1e-6, 0.0, 1.0))
        assert writers.IncrementalBatchWriter(str(p)).completed() == {2}
