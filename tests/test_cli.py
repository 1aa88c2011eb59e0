"""CLI end-to-end smoke tests (subprocess, CPU backend).

These drive the argparse front-ends exactly as a user would, on a tiny
synthetic Darknet dataset (and the reference golden image where
available)."""

import os
import subprocess
import sys

import cv2
import numpy as np
import pytest

from tests.conftest import COCO_DATA, GOLDEN_IMG, requires_reference

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLI = os.path.join(REPO, "cli")


def run_cli(script, *args, timeout=600):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    return subprocess.run(
        [sys.executable, os.path.join(CLI, script), *args],
        capture_output=True, text=True, timeout=timeout, env=env,
        cwd=REPO)


@pytest.fixture(scope="module")
def tiny_world(tmp_path_factory):
    """Synthetic dataset + .data/.names config for a tiny 3-class model."""
    root = tmp_path_factory.mktemp("world")
    rng = np.random.RandomState(0)
    paths = []
    for i in range(6):
        img = rng.randint(0, 255, (96, 128, 3), np.uint8)
        p = root / f"im{i}.jpg"
        cv2.imwrite(str(p), img)
        (root / f"im{i}.txt").write_text(
            f"{i % 3} 0.5 0.5 0.4 0.4\n{(i + 1) % 3} 0.25 0.25 0.2 0.2\n")
        paths.append(str(p))
    (root / "train.txt").write_text("\n".join(paths) + "\n")
    (root / "val.txt").write_text("\n".join(paths[:3]) + "\n")
    (root / "tiny.names").write_text("aaa\nbbb\nccc\n")
    (root / "tiny.data").write_text(
        "[name]\nmodel_name=tiny\n\n[train-configure]\nepochs=1\n"
        "steps=100,200\nbatch_size=3\nsubdivisions=1\nlearning_rate=0.001\n"
        "\n[model-configure]\npre_weights=None\nclasses=3\nwidth=64\n"
        "height=64\nanchor_num=3\n"
        "anchors=5.2,6.1, 9.3,10.4, 14.5,18.6, 22.7,20.8, 30.9,28.1, 44.2,40.3\n"
        "\n[data-configure]\n"
        f"train={root}/train.txt\nval={root}/val.txt\n"
        f"names={root}/tiny.names\n")
    return root


@requires_reference
def test_cli_test_golden_image(tmp_path):
    out = str(tmp_path / "res.png")
    r = run_cli("test.py", "--data", COCO_DATA,
                "--weights", os.path.join(REPO, "weights/coco2017-ref.npz"),
                "--img", GOLDEN_IMG, "--output", out)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "forward time" in r.stdout
    assert "person" in r.stdout       # golden image contains a person
    assert os.path.exists(out)
    assert cv2.imread(out) is not None

    rf = run_cli("test.py", "--data", COCO_DATA,
                 "--weights", os.path.join(REPO, "weights/coco2017-ref.npz"),
                 "--img", GOLDEN_IMG, "--output", out, "--fused")
    assert rf.returncode == 0, rf.stderr[-3000:]
    # fused serving path prints the same detection lines
    det = [ln for ln in r.stdout.splitlines() if ln.startswith(("person",
                                                                "bicycle"))]
    detf = [ln for ln in rf.stdout.splitlines() if ln.startswith(("person",
                                                                  "bicycle"))]
    assert det == detf, (det, detf)


def test_cli_genanchors(tiny_world, tmp_path):
    r = run_cli("genanchors.py", "--traintxt", str(tiny_world / "train.txt"),
                "--output_dir", str(tmp_path), "--num_clusters", "4",
                "--input_width", "64", "--input_height", "64",
                "--seed", "0")
    assert r.returncode == 0, r.stderr[-3000:]
    out = tmp_path / "anchors4.txt"
    assert out.exists()
    lines = out.read_text().strip().split("\n")
    pairs = lines[0].replace(", ", ";").split(";")
    assert len(pairs) == 4
    widths = [float(p.split(",")[0]) for p in pairs]
    assert widths == sorted(widths)
    assert 0 < float(lines[1]) <= 1


def test_cli_train_and_eval(tiny_world, tmp_path):
    """One epoch of training on the tiny dataset, then evaluation with the
    saved weights — the full user workflow end-to-end."""
    wdir = str(tmp_path / "w")
    cdir = str(tmp_path / "c")
    r = run_cli("train.py", "--data", str(tiny_world / "tiny.data"),
                "--weights_dir", wdir, "--ckpt_dir", cdir)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "Starting training" in r.stdout
    assert "Total:" in r.stdout
    final = os.path.join(wdir, "tiny-final-model.npz")
    assert os.path.exists(final)

    r2 = run_cli("evaluation.py", "--data", str(tiny_world / "tiny.data"),
                 "--weights", final)
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert ("Precision:" in r2.stdout
            or "No detections" in r2.stdout), r2.stdout

    # the fused (Pallas, s2d-input) eval path prints the same metrics
    r3 = run_cli("evaluation.py", "--data", str(tiny_world / "tiny.data"),
                 "--weights", final, "--fused")
    assert r3.returncode == 0, r3.stderr[-3000:]

    def summary(out):
        lines = [ln for ln in out.splitlines() if ln.startswith("Precision:")]
        return lines[-1] if lines else None

    s2, s3 = summary(r2.stdout), summary(r3.stdout)
    if s2 is not None:
        vals2 = [float(t.split(":")[1]) for t in s2.split()]
        vals3 = [float(t.split(":")[1]) for t in s3.split()]
        np.testing.assert_allclose(vals3, vals2, atol=1e-6)


def _write_data(tiny_world, tmp_path, name, epochs):
    """Clone tiny.data with a different epoch count."""
    txt = (tiny_world / "tiny.data").read_text()
    out = tmp_path / name
    out.write_text(txt.replace("epochs=1", f"epochs={epochs}"))
    return str(out)


def _load_npz_dict(path):
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


@pytest.mark.slow
def test_cli_train_cadence_resume_chain(tiny_world, tmp_path):
    """The 10-epoch-style eval/save cadence executes, and an interrupted
    run resumed with --resume reproduces the uninterrupted run's final
    params BITWISE (epoch-keyed shuffle + per-(epoch,index) augmentation
    RNG make training resume-deterministic).

    Note on --chain: a chained lax.scan program reassociates float
    reductions, so chain-vs-nochain params agree only to ~1e-5 per call —
    and this tiny high-loss setup amplifies 1e-5 to O(0.1) within two
    steps (measured), so cross-mode equality is not a meaningful check.
    Program-level chain==sequential equivalence is pinned by
    tests/test_trainer.py::test_chained_train_steps; here we pin the CLI
    wiring: the all-leftover path (--chain larger than the epoch) is
    bitwise-equal to the plain path, and the full-chain path trains and
    resumes end-to-end."""
    data4 = _write_data(tiny_world, tmp_path, "tiny4.data", 4)
    data2 = _write_data(tiny_world, tmp_path, "tiny2.data", 2)

    # Run A: uninterrupted 4 epochs, eval/save cadence every 2 epochs
    wa, ca = str(tmp_path / "wa"), str(tmp_path / "ca")
    ra = run_cli("train.py", "--data", data4, "--weights_dir", wa,
                 "--ckpt_dir", ca, "--eval_every", "2")
    assert ra.returncode == 0, ra.stderr[-3000:]
    assert "computer mAP..." in ra.stdout          # cadence eval ran
    assert "Precision:" in ra.stdout
    stamped = [f for f in os.listdir(wa) if "-2-epoch-" in f]
    assert stamped, f"no AP-stamped cadence save in {os.listdir(wa)}"
    a = _load_npz_dict(os.path.join(wa, "tiny-final-model.npz"))

    # Run B: train 2 epochs ("interrupted"), snapshot the checkpoint,
    # then resume for 2 more — plain and all-leftover-chain variants
    wb, cb = str(tmp_path / "wb"), str(tmp_path / "cb")
    rb1 = run_cli("train.py", "--data", data2, "--weights_dir", wb,
                  "--ckpt_dir", cb)
    assert rb1.returncode == 0, rb1.stderr[-3000:]
    import shutil
    cc = str(tmp_path / "cc")
    cd = str(tmp_path / "cd")
    shutil.copytree(cb, cc)
    shutil.copytree(cb, cd)

    rb2 = run_cli("train.py", "--data", data4, "--weights_dir", wb,
                  "--ckpt_dir", cb, "--resume")
    assert rb2.returncode == 0, rb2.stderr[-3000:]
    assert "Resumed from epoch 2" in rb2.stdout
    b = _load_npz_dict(os.path.join(wb, "tiny-final-model.npz"))
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    # all-leftover chain (chain 4 > 2 steps/epoch): singles path, bitwise
    wc = str(tmp_path / "wc")
    rc2 = run_cli("train.py", "--data", data4, "--weights_dir", wc,
                  "--ckpt_dir", cc, "--resume", "--chain", "4")
    assert rc2.returncode == 0, rc2.stderr[-3000:]
    c = _load_npz_dict(os.path.join(wc, "tiny-final-model.npz"))
    for k in a:
        np.testing.assert_array_equal(a[k], c[k], err_msg=k)

    # full-chain path: trains, resumes, saves (arithmetic equivalence of
    # the chained program itself is unit-tested)
    wd = str(tmp_path / "wd")
    rd2 = run_cli("train.py", "--data", data4, "--weights_dir", wd,
                  "--ckpt_dir", cd, "--resume", "--chain", "2")
    assert rd2.returncode == 0, rd2.stderr[-3000:]
    assert "chaining 2 train steps" in rd2.stdout
    assert "Resumed from epoch 2" in rd2.stdout
    d = _load_npz_dict(os.path.join(wd, "tiny-final-model.npz"))
    for k in a:
        assert np.isfinite(d[k]).all(), k


def test_cli_export(tiny_world, tmp_path):
    """Train-less export path: random init would need weights; reuse the
    converted reference weights only when present, else skip."""
    npz = os.path.join(REPO, "weights/coco2017-ref.npz")
    if not os.path.exists(npz):
        pytest.skip("no converted weights available")
    out = str(tmp_path / "m.stablehlo")
    r = run_cli("export.py", "--data", COCO_DATA, "--weights", npz,
                "--output", out)
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.getsize(out) > 100_000


def test_cli_train_anchorfree(tiny_world, tmp_path):
    """The anchor-free model family trains and saves via the same CLI."""
    wdir = str(tmp_path / "w")
    cdir = str(tmp_path / "c")
    r = run_cli("train.py", "--data", str(tiny_world / "tiny.data"),
                "--weights_dir", wdir, "--ckpt_dir", cdir,
                "--model", "anchorfree")
    assert r.returncode == 0, r.stderr[-3000:]
    assert "Total:" in r.stdout
    assert os.path.exists(os.path.join(wdir, "tiny-final-model.npz"))
