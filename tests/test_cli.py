"""CLI end-to-end smoke tests (reference analog: examples/cli.cpp operator
and stream runtimes driven by the docker quick-start)."""
import os
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _run_cli(argv):
    from hyperpose_tpu.cli import main

    old = sys.argv
    sys.argv = ["cli"] + argv
    try:
        main()
    finally:
        sys.argv = old


@pytest.fixture(scope="module")
def media(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_media")
    rng = np.random.default_rng(0)
    img_dir = root / "imgs"
    img_dir.mkdir()
    for i in range(3):
        cv2.imwrite(str(img_dir / f"f{i}.jpg"),
                    rng.integers(0, 256, (120, 160, 3), np.uint8))
    vid = str(root / "v.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 10, (160, 120))
    for _ in range(10):
        w.write(rng.integers(0, 256, (120, 160, 3), np.uint8))
    w.release()
    return {"imgs": str(img_dir), "video": vid, "root": root}


def test_cli_operator_images(media):
    """Operator runtime over an image directory writes annotated outputs
    (reference: cli.cpp:184-285 operator mode)."""
    prefix = str(media["root"] / "op_out")
    _run_cli([
        "--source", media["imgs"], "--runtime", "operator",
        "--w", "112", "--h", "96", "--max_batch_size", "2",
        "--saving_prefix", prefix,
    ])
    # operator mode writes annotated images into the saving_prefix dir
    assert len(os.listdir(prefix)) == 3


def test_cli_stream_video(media):
    """Stream runtime: video in -> annotated video out, frame count
    preserved (reference: cli.cpp stream mode + stream.cpp write_to)."""
    prefix = str(media["root"] / "stream_out")
    _run_cli([
        "--source", media["video"], "--runtime", "stream",
        "--w", "112", "--h", "96", "--max_batch_size", "4",
        "--limit", "8", "--saving_prefix", prefix,
    ])
    out = prefix + ".mp4"
    assert os.path.exists(out)
    cap = cv2.VideoCapture(out)
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 8


@pytest.mark.parametrize("script", [
    "operator_image_batch.py", "operator_imshow.py", "operator_video.py",
    "stream_video.py", "tutorial_minimum.py", "tutorial_stream.py",
    "gen_serialized_engine.py",
])
def test_example_scripts_parse(script):
    """Example programs (reference: examples/*.example.cpp inventory)
    compile and expose an argparse/CLI surface."""
    import py_compile

    path = os.path.join(
        os.path.dirname(__file__), "..", "examples", script
    )
    py_compile.compile(path, doraise=True)
