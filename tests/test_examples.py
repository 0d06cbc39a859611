"""Examples must stay runnable (executed in-process on the CPU backend)."""
import os
import runpy
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def run_example(name, argv):
    old = sys.argv
    sys.argv = [name] + argv
    try:
        runpy.run_path(os.path.join(EXAMPLES, name), run_name="__main__")
    finally:
        sys.argv = old


def test_run_sim_slam_example(capsys):
    run_example("run_sim_slam.py", ["--ticks", "40"])
    out = capsys.readouterr().out
    assert "ATE slam=" in out


def test_fleet_example(capsys):
    run_example("fleet_mapping.py", ["--robots", "2", "--ticks", "25"])
    out = capsys.readouterr().out
    assert out.count("robot ") == 2


def test_minimal_filter_example(capsys):
    run_example("minimal_filter.py", [])
    out = capsys.readouterr().out
    assert "landmarks" in out and "pose error" in out


def test_legacy_pipeline_example(capsys):
    run_example("legacy_pipeline.py", [])
    out = capsys.readouterr().out
    assert "final pose est" in out


def test_elastic_recovery_example(capsys):
    run_example("elastic_recovery.py",
                ["--ticks", "48", "--every", "16", "--die-at", "34",
                 "--ckpt-dir", "/tmp/er_test"])
    out = capsys.readouterr().out
    assert "bit-continuous=True" in out


def test_streaming_example(capsys):
    import json
    run_example("streaming_slam.py",
                ["--ticks", "32", "--rate-hz", "0", "--window", "8",
                 "--n-beams", "180", "--json"])
    out = capsys.readouterr().out
    s = json.loads(out.strip().splitlines()[-1])
    assert s["ticks"] == 32 and s["completed"] == 32
    assert s["latency_p99_ms"] >= s["latency_p50_ms"] > 0


def test_occupancy_mapping_example(capsys):
    run_example("occupancy_mapping.py", ["--ticks", "40"])
    out = capsys.readouterr().out
    assert "occupied=" in out and "free=" in out


def test_socket_slam_example(capsys):
    import pytest
    with pytest.raises(SystemExit) as e:
        run_example("socket_slam.py",
                    ["--ticks", "30", "--port", "47397"])
    assert e.value.code == 0
    out = capsys.readouterr().out
    assert "tick-exact vs offline run: PASS" in out


def test_live_view_example(tmp_path, capsys):
    import pytest
    gif = str(tmp_path / "live.gif")
    with pytest.raises(SystemExit) as e:
        run_example("live_view.py",
                    ["--ticks", "12", "--gif", gif, "--every", "3"])
    assert e.value.code == 0
    out = capsys.readouterr().out
    assert "live view: 4 frames" in out
    import os
    assert os.path.getsize(gif) > 1000       # a real multi-frame GIF


def test_sr_filter_example(capsys):
    import pytest
    with pytest.raises(SystemExit) as e:
        run_example("sr_filter.py", ["--ticks", "30"])
    assert e.value.code == 0
    out = capsys.readouterr().out
    assert "square-root forms PSD: PASS" in out
    assert "factor triangular: True" in out


def test_socket_slam_native_feeder_example(capsys):
    import pytest
    with pytest.raises(SystemExit) as e:
        run_example("socket_slam.py",
                    ["--ticks", "25", "--port", "47423", "--native"])
    assert e.value.code == 0
    out = capsys.readouterr().out
    assert "tick-exact vs offline run: PASS" in out
