"""Native C++ extension, CLI, and compare-harness tests.

Covers the host-runtime layer: OpenCV-FileStorage YAML IO (validated against
cv2.FileStorage both directions), BMP IO (validated against cv2.imread),
fused mask prep (validated against the NumPy oracle), the reference-argv CLI
end-to-end on YAML fixtures, and the vs.py-equivalent diff harness.
"""

import numpy as np
import pytest

from seamlesscloneoptimization_tpu import native
from seamlesscloneoptimization_tpu.core.reference import mask_bounding_box, zero_mask_border

pytestmark = pytest.mark.skipif(not native.HAVE_NATIVE, reason="native toolchain missing")

REF_IMAGES = "/root/reference/seamlessClone-CUDA/images"


class TestYamlIO:
    def test_reads_reference_fixture_exactly_as_cv2(self):
        import cv2

        src = native.read_yaml_mat(f"{REF_IMAGES}/src.yml")
        fs = cv2.FileStorage(f"{REF_IMAGES}/src.yml", cv2.FILE_STORAGE_READ)
        assert np.array_equal(src, fs.getNode("data").mat())
        assert src.shape == (194, 300, 3) and src.dtype == np.uint8

    def test_roundtrip_u8_and_cv2_reads_our_output(self, tmp_path, airplane):
        import cv2

        p = tmp_path / "t.yml"
        native.write_yaml_mat(p, airplane, name="src")
        assert np.array_equal(native.read_yaml_mat(p), airplane)
        fs = cv2.FileStorage(str(p), cv2.FILE_STORAGE_READ)
        assert np.array_equal(fs.getNode("data").mat(), airplane)

    def test_roundtrip_float32_and_int32(self, tmp_path):
        rng = np.random.default_rng(0)
        f = rng.normal(size=(5, 7, 3)).astype(np.float32)
        native.write_yaml_mat(tmp_path / "f.yml", f, name="g0")
        assert np.array_equal(native.read_yaml_mat(tmp_path / "f.yml"), f)
        i = rng.integers(-1000, 1000, (4, 6)).astype(np.int32)
        native.write_yaml_mat(tmp_path / "i.yml", i, name="d")
        assert np.array_equal(native.read_yaml_mat(tmp_path / "i.yml"), i)


class TestBmpIO:
    def test_roundtrip_and_cv2_interop(self, tmp_path, airplane):
        import cv2

        p = tmp_path / "t.bmp"
        native.write_bmp(p, airplane)
        assert np.array_equal(native.read_bmp(p), airplane)
        assert np.array_equal(cv2.imread(str(p)), airplane)
        # and read a cv2-written BMP
        q = tmp_path / "cv.bmp"
        cv2.imwrite(str(q), airplane)
        assert np.array_equal(native.read_bmp(q), airplane)

    def test_grayscale_expands(self, tmp_path):
        g = np.arange(0, 250, dtype=np.uint8).reshape(10, 25)
        native.write_bmp(tmp_path / "g.bmp", g)
        back = native.read_bmp(tmp_path / "g.bmp")
        assert np.array_equal(back[..., 0], g)
        assert np.array_equal(back[..., 1], g)


class TestPrepMask:
    @pytest.mark.parametrize(
        "build",
        [
            lambda: (np.zeros((194, 300), np.uint8), (slice(20, 100), slice(30, 200), 7)),
            lambda: (np.full((50, 60), 255, np.uint8), None),
            lambda: (np.zeros((10, 12), np.uint8), None),
        ],
    )
    def test_matches_numpy_oracle(self, build):
        mask, fill = build()
        if fill is not None:
            mask[fill[0], fill[1]] = fill[2]
        prep, bbox = native.prep_mask(mask)
        ref = zero_mask_border(np.where(mask != 0, np.uint8(255), np.uint8(0)))
        assert np.array_equal(prep, ref)
        assert bbox == mask_bounding_box(ref)

    def test_single_pixel(self):
        mask = np.zeros((9, 9), np.uint8)
        mask[4, 5] = 1
        prep, bbox = native.prep_mask(mask)
        assert bbox == (5, 4, 1, 1)
        assert prep[4, 5] == 255 and prep.sum() == 255


class TestCliAndCompare:
    def test_cli_end_to_end_vs_cv2(self, tmp_path, airplane, sky):
        import cv2

        from seamlesscloneoptimization_tpu.cli import main
        from seamlesscloneoptimization_tpu.compare import compare_images

        native.write_yaml_mat(tmp_path / "src.yml", airplane, "src")
        native.write_yaml_mat(tmp_path / "dst.yml", sky, "dst")
        mask = np.full(airplane.shape[:2], 255, np.uint8)
        native.write_yaml_mat(tmp_path / "mask.yml", mask, "src_mask")

        rc = main(
            [
                str(tmp_path / "src.yml"),
                str(tmp_path / "dst.yml"),
                str(tmp_path / "mask.yml"),
                "800",
                "150",
                "0",
                "--output-dir",
                str(tmp_path / "out"),
            ]
        )
        assert rc == 0
        assert (tmp_path / "out" / "ucRGB_Output.bmp").exists()
        assert (tmp_path / "out" / "result.yml").exists()

        golden = cv2.seamlessClone(airplane, sky, mask.copy(), (800, 150), cv2.NORMAL_CLONE)
        cv2.imwrite(str(tmp_path / "golden.bmp"), golden)
        stats = compare_images(
            str(tmp_path / "out" / "ucRGB_Output.bmp"),
            str(tmp_path / "golden.bmp"),
            out_dir=str(tmp_path / "diff"),
        )
        assert stats["diff_max"] <= 1.0
        assert stats["percent_diff"] < 0.1
        assert (tmp_path / "diff" / "diff.bmp").exists()

    def test_compare_yaml_stage_mode(self, tmp_path):
        from seamlesscloneoptimization_tpu.compare import compare_yaml_stage

        rng = np.random.default_rng(1)
        g = rng.normal(size=(20, 30)).astype(np.float32)
        native.write_yaml_mat(tmp_path / "a.yml", g, "g0")
        native.write_yaml_mat(tmp_path / "b.yml", g + 1e-3, "mod_diff2")
        stats = compare_yaml_stage(tmp_path / "a.yml", tmp_path / "b.yml")
        assert 0.9e-3 < stats["abs_max"] < 1.1e-3


class TestDebugDump:
    def test_dump_stages_writes_artifacts(self, tmp_path, airplane, sky):
        from seamlesscloneoptimization_tpu.core.config import CloneConfig
        from seamlesscloneoptimization_tpu.core.engine import SeamlessClone

        eng = SeamlessClone(CloneConfig(debug_dir=str(tmp_path / "dbg")))
        mask = np.full(airplane.shape[:2], 255, np.uint8)
        out, stages = eng.dump_stages(airplane, sky, mask, (800, 150))
        assert out.shape == sky.shape
        for k in ("mask_eroded", "gx", "gy", "rhs", "u"):
            assert k in stages
        for f in ("g0.yml", "g1.yml", "g2.yml", "mask_eroded.yml", "output.bmp", "u.npy"):
            assert (tmp_path / "dbg" / f).exists(), f
        # the dumped RHS reloads bit-exactly (the g-vs-mod_diff method)
        g0 = native.read_yaml_mat(tmp_path / "dbg" / "g0.yml")
        assert np.array_equal(g0, stages["rhs"][0])


class TestCApi:
    def test_c_abi_smoke(self):
        """Build libseamlessclone_tpu.so + the C test program and run it.

        The C ABI (native/src/capi.cpp) mirrors the reference extern-C
        surface (seamlessclone_cuda.h:6-62); the smoke test drives
        create/run/sync/destroy from plain C with the CPU backend.
        """
        import subprocess
        from pathlib import Path

        native_dir = Path(__file__).resolve().parent.parent / "seamlesscloneoptimization_tpu" / "native"
        r = subprocess.run(
            ["make", "test"], cwd=native_dir, capture_output=True, text=True, timeout=300
        )
        assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
        assert "C ABI smoke test PASSED" in r.stdout


class TestCliErrors:
    def test_missing_file_fails_cleanly(self, tmp_path):
        from seamlesscloneoptimization_tpu.cli import main

        with pytest.raises(FileNotFoundError):
            main([str(tmp_path / "nope.yml"), str(tmp_path / "nope2.yml"),
                  str(tmp_path / "nope3.yml"), "10", "10"])

    def test_bad_device_id(self, tmp_path, airplane):
        from seamlesscloneoptimization_tpu.cli import main

        native.write_yaml_mat(tmp_path / "a.yml", airplane, "src")
        rc = main([str(tmp_path / "a.yml"), str(tmp_path / "a.yml"),
                   str(tmp_path / "a.yml"), "10", "10", "99"])
        assert rc == 2


class TestNativeFuzz:
    @pytest.mark.parametrize("content", [
        b"",
        b"garbage not yaml at all",
        b"%YAML:1.0\n---\nrows: 2\ncols: 2\ndt: u\n",           # no data
        b"%YAML:1.0\n---\nrows: 999999999\ncols: 999999999\ndt: u\ndata: [ 1 ]\n",
        b"%YAML:1.0\n---\nrows: -5\ncols: 3\ndt: u\ndata: [ 1 ]\n",
        b"%YAML:1.0\n---\nrows: 2\ncols: 2\ndt: z\ndata: [ 1, 2, 3, 4 ]\n",
        b"%YAML:1.0\n---\nrows: 4\ncols: 4\ndt: 3u\ndata: [ 1, 2 ]\n",  # short data
    ])
    def test_malformed_yaml_raises_not_aborts(self, tmp_path, content):
        p = tmp_path / "bad.yml"
        p.write_bytes(content)
        with pytest.raises((ValueError, KeyError)):
            native.read_yaml_mat(p)

    def test_truncated_bmp_raises(self, tmp_path):
        p = tmp_path / "bad.bmp"
        p.write_bytes(b"BM\x00\x00")
        with pytest.raises((ValueError, OSError)):
            native.read_bmp(p)
