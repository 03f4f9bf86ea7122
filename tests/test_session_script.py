"""CPU smoke tests for the queued TPU session scripts' plumbing.

Round 3 queued `scripts/round3_tpu_session.sh` behind a multi-hour tunnel
outage; a flag typo or path bug would have burned the whole TPU window when
it finally ran. These tests drive the actual bash scripts end-to-end on a
tiny generated dataset with the CPU backend (GSCAN_JAX_PLATFORM=cpu — the
sitecustomize jax preload makes JAX_PLATFORMS too late), so every CLI
invocation, grep, and artifact path in the scripts executes for real.
"""

import json
import os
import random
import subprocess

import numpy as np
import pytest

from multimodal_seq2seq_gscan_tpu.cli import gscan as gscan_cli

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Small model + small batches so each scripted CLI subprocess finishes in
# seconds on the CPU backend.
TINY_MODEL_FLAGS = (
    "--embedding_dimension=12 --encoder_hidden_size=16 "
    "--decoder_hidden_size=16 --cnn_kernel_size=3 "
    "--cnn_hidden_num_channels=8 --test_batch_size=32 "
    "--max_training_examples=64 --steps_per_execution=4 "
    "--compilation_cache_dir=")


@pytest.fixture(scope="module")
def tiny_data_dir(tmp_path_factory):
    directory = str(tmp_path_factory.mktemp("session_data"))
    random.seed(7)
    np.random.seed(7)
    flags = {a.dest: a.default for a in gscan_cli.build_parser()._actions
             if a.dest != "help"}
    flags.update(
        mode="generate", output_directory=directory, split="uniform",
        grid_size=6, num_resampling=1, max_examples=200,
        intransitive_verbs="walk", transitive_verbs="push", adverbs="",
        nouns="circle,square", color_adjectives="red,green",
        size_adjectives="big,small", type_grammar="normal",
        make_dev_set=True, visualize_per_template=0)
    gscan_cli.main(flags)
    assert os.path.exists(os.path.join(directory, "dataset.txt"))
    return directory


def _script_env(data_dir, tmp_path, **overrides):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update(
        GSCAN_JAX_PLATFORM="cpu",
        R3_DATA=data_dir,
        R3_LOG=str(tmp_path / "perf_log.txt"),
        R3_ITERS="6", R3_EVAL="3", R3_PRINT="3", R3_BATCH="32",
        R3_EXTRA=TINY_MODEL_FLAGS)
    env.update(overrides)
    return env


def test_round3_session_script_smoke(tiny_data_dir, tmp_path):
    run_dir = str(tmp_path / "run")
    env = _script_env(
        tiny_data_dir, tmp_path, R3_SKIP_PERF="1", R3_RUN=run_dir,
        R3_SPLITS="test,dev",
        R3_TRAINLOG_DIR=str(tmp_path / "training_logs"),
        R3_RESULTS=str(tmp_path / "results.json"))
    proc = subprocess.run(
        ["bash", "scripts/round3_tpu_session.sh"], cwd=REPO_ROOT, env=env,
        capture_output=True, text=True, timeout=600)
    train_log = tmp_path / "training_logs" / "run.txt"
    assert proc.returncode == 0, (
        proc.stderr[-2000:] + "\n" +
        (train_log.read_text()[-2000:] if train_log.exists() else ""))
    # Training ran through the stratified resident path and checkpointed.
    assert os.path.exists(os.path.join(run_dir, "checkpoint.msgpack"))
    assert os.path.exists(os.path.join(run_dir, ".done"))
    assert "Finished training" in train_log.read_text()
    # Test mode predicted both splits and the summary JSON parsed them.
    assert os.path.exists(os.path.join(run_dir, ".tested"))
    for split in ("test", "dev"):
        with open(os.path.join(run_dir, split + "_predict.json")) as f:
            assert len(json.load(f)) > 0
    with open(tmp_path / "results.json") as f:
        rows = json.load(f)
    assert {row["split"] for row in rows} >= {"test", "dev"}
    # The session log recorded both section banners.
    log_text = (tmp_path / "perf_log.txt").read_text()
    assert "stratified run" in log_text
    assert "session done" in log_text


def test_round3_stratified_perf_script_smoke(tiny_data_dir, tmp_path):
    env = _script_env(tiny_data_dir, tmp_path, R3_SKIP_BENCH="1",
                      R3_SKIP_PALLAS="1")
    proc = subprocess.run(
        ["bash", "scripts/round3_stratified_perf.sh"], cwd=REPO_ROOT,
        env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    log_text = (tmp_path / "perf_log.txt").read_text()
    assert "teacher_forced=xla" in log_text
    assert "full-width run" in log_text
    # Both training subprocesses ran to completion and the grep captured
    # their evaluation lines into the session log.
    assert log_text.count("Evaluation Accuracy") >= 2


def _r4_env(data_dir, tmp_path, **overrides):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update(
        GSCAN_JAX_PLATFORM="cpu",
        R4_DATA=data_dir,
        R4_LOG=str(tmp_path / "perf_log.txt"),
        R4_ITERS="6", R4_TENK_ITERS="4", R4_EVAL="3", R4_TENK_EVAL="2",
        R4_PRINT="2", R4_BATCH="32",
        R4_EXTRA=TINY_MODEL_FLAGS)
    env.update(overrides)
    return env


def test_round4_session_script_smoke(tiny_data_dir, tmp_path):
    run_dir = str(tmp_path / "run4")
    env = _r4_env(
        tiny_data_dir, tmp_path, R4_SKIP_BENCH="1", R4_SKIP_PALLAS="1",
        R4_RUN=run_dir, R4_SPLITS="test,dev",
        R4_TRAINLOG_DIR=str(tmp_path / "training_logs"),
        R4_RESULTS=str(tmp_path / "results.json"))
    proc = subprocess.run(
        ["bash", "scripts/round4_tpu_session.sh"], cwd=REPO_ROOT, env=env,
        capture_output=True, text=True, timeout=600)
    train_log = tmp_path / "training_logs" / "run4.txt"
    assert proc.returncode == 0, (
        proc.stderr[-2000:] + "\n" +
        (train_log.read_text()[-2000:] if train_log.exists() else ""))
    assert os.path.exists(os.path.join(run_dir, "checkpoint.msgpack"))
    assert os.path.exists(os.path.join(run_dir, ".done"))
    assert os.path.exists(os.path.join(run_dir, ".tested"))
    with open(tmp_path / "results.json") as f:
        rows = json.load(f)
    assert {row["split"] for row in rows} >= {"test", "dev"}
    log_text = (tmp_path / "perf_log.txt").read_text()
    # The 10k sub-runs (stratified xla + full-width control) both logged.
    assert "teacher_forced=xla" in log_text
    assert "full-width control" in log_text
    assert "session done" in log_text


def test_round4_session_script_dataset_guard(tmp_path):
    """Missing dataset.txt must fail fast with the regeneration command —
    the Aug 19 between-rounds session burned its TPU window on exactly
    this (data/*/dataset.txt is gitignored)."""
    env = _r4_env(str(tmp_path / "nonexistent"), tmp_path)
    proc = subprocess.run(
        ["bash", "scripts/round4_tpu_session.sh"], cwd=REPO_ROOT, env=env,
        capture_output=True, text=True, timeout=60)
    assert proc.returncode == 1
    assert "Regenerate first" in proc.stdout
    assert "--make_dev_set" in proc.stdout


def _r4b_env(data_dir, tmp_path, **overrides):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update(
        GSCAN_JAX_PLATFORM="cpu",
        R4B_DATA=data_dir,
        R4B_LOG=str(tmp_path / "perf_log.txt"),
        R4B_ITERS="6", R4B_TENK_ITERS="4", R4B_EVAL="3", R4B_TENK_EVAL="2",
        R4B_PRINT="2", R4B_BATCH="32",
        R4B_TRAINLOG_DIR=str(tmp_path / "training_logs"),
        R4B_RESULTS_DIR=str(tmp_path),
        R4B_TMP=str(tmp_path / "r4b_tmp"),
        R4B_EXTRA=TINY_MODEL_FLAGS)
    env.update(overrides)
    return env


def test_round4b_session_script_smoke(tiny_data_dir, tmp_path):
    """Drives the control and winner phases end-to-end (train + test + the
    summary JSON), exercising the cuts / wide_mix / interleave flags through
    the real CLI.  The 10k variant loop is skipped to keep this under the
    subprocess budget on a contended CPU — its run10k helper is the same
    plumbing the round-3/4 scripts' smoke tests already drive."""
    control = str(tmp_path / "ctrl")
    winner = str(tmp_path / "winner")
    env = _r4b_env(
        tiny_data_dir, tmp_path, R4B_CONTROL_RUN=control,
        R4B_SKIP_10K="1", R4B_RUN=winner, R4B_SPLITS="test,dev",
        R4B_WINNER_EXTRA="--chunk_layout=stratified --stratified_widths=8 "
                         "--stratified_wide_mix=0.5 --stratified_interleave")
    proc = subprocess.run(
        ["bash", "scripts/round4b_tpu_session.sh"], cwd=REPO_ROOT, env=env,
        capture_output=True, text=True, timeout=1200)
    ctrl_log = tmp_path / "training_logs" / "ctrl.txt"
    assert proc.returncode == 0, (
        proc.stderr[-2000:] + "\n" +
        (ctrl_log.read_text()[-2000:] if ctrl_log.exists() else ""))
    for run_dir in (control, winner):
        assert os.path.exists(os.path.join(run_dir, ".done"))
        assert os.path.exists(os.path.join(run_dir, ".tested"))
        with open(os.path.join(run_dir, "dev_predict.json")) as f:
            assert len(json.load(f)) > 0
    log_text = (tmp_path / "perf_log.txt").read_text()
    for banner in ("FULL-width control", "winner run", "session done"):
        assert banner in log_text, banner


def test_round5_session_script_smoke(tiny_data_dir, tmp_path):
    """Drives scripts/round5_tpu_session.sh end-to-end on CPU: a tiny
    training produces the checkpoint, then the f32-vs-bfloat16_keys identity
    phase (test-mode CLI x2 + compare) and the multi-seed campaign phase run
    through the real CLIs. Bench and the A/B are skipped (covered by their
    own tests)."""
    run_dir = str(tmp_path / "run")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update(GSCAN_JAX_PLATFORM="cpu")
    train = subprocess.run(
        ["python", "-m", "multimodal_seq2seq_gscan_tpu.cli.seq2seq",
         "--mode=train", f"--data_directory={tiny_data_dir}",
         f"--output_directory={run_dir}", "--conditional_attention",
         "--no_auxiliary_task", "--training_batch_size=32",
         "--max_training_iterations=6", "--seed=66",
         "--generate_vocabularies", "--evaluate_every=6", "--print_every=3",
         "--max_testing_examples=32", "--max_decoding_steps=20"]
        + TINY_MODEL_FLAGS.split(),
        cwd=REPO_ROOT, env=env, capture_output=True, text=True, timeout=600)
    assert train.returncode == 0, train.stderr[-2000:]
    ms_run = str(tmp_path / "ms_run")
    env.update(
        R5_DATA=tiny_data_dir,
        R5_LOG=str(tmp_path / "perf_log.txt"),
        R5_RUN=run_dir, R5_SPLITS="dev", R5_SKIP_BENCH="1", R5_SKIP_AB="1",
        R5_TMP=str(tmp_path / "r5_tmp"),
        R5_MS_ITERS="6", R5_MS_EVAL="3", R5_MS_PRINT="3", R5_MS_BATCH="16",
        R5_MS_SEEDS="7,8", R5_MS_RUN=ms_run,
        R5_EXTRA=TINY_MODEL_FLAGS + " --max_decoding_steps=20")
    proc = subprocess.run(
        ["bash", "scripts/round5_tpu_session.sh"], cwd=REPO_ROOT,
        env=env, capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-2000:]
    for dt in ("float32", "bfloat16_keys"):
        pred = tmp_path / "r5_tmp" / f"identity_{dt}" / "dev_predict.json"
        assert pred.exists(), proc.stderr[-2000:]
        with open(pred) as f:
            assert len(json.load(f)) > 0
    for seed in ("7", "8"):
        assert os.path.exists(
            os.path.join(ms_run, f"seed_{seed}", "checkpoint.msgpack"))
    log_text = (tmp_path / "perf_log.txt").read_text()
    assert "prediction identity" in log_text
    assert "prediction_mismatches=" in log_text
    assert "identity rc=" in log_text
    assert "multiseed campaign" in log_text
    assert "session done" in log_text


def test_round5b_session_script_resume_smoke(tiny_data_dir, tmp_path):
    """Drives scripts/round5b_tpu_session.sh twice on CPU: the first
    invocation runs a tiny 2-seed campaign to iteration 3 (checkpointing at
    the eval boundary); the second — with `.done` removed, simulating a
    killed session — must take the resume branch (--resume_from_file from
    the per-seed checkpoints) and continue to iteration 6."""
    run_dir = str(tmp_path / "ms_run")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update(
        GSCAN_JAX_PLATFORM="cpu",
        R5B_DATA=tiny_data_dir,
        R5B_LOG=str(tmp_path / "perf_log.txt"),
        R5B_RUN=run_dir, R5B_ITERS="3", R5B_SEEDS="7,8",
        R5B_SPLITS="dev", R5B_BATCH="16", R5B_EVAL="3", R5B_PRINT="3",
        R5B_TESTN="16", R5B_MAXDEC="20", R5B_CACHE="",
        R5B_TLOG=str(tmp_path / "train_log.txt"),
        R5B_EXTRA=TINY_MODEL_FLAGS)
    proc = subprocess.run(
        ["bash", "scripts/round5b_tpu_session.sh"], cwd=REPO_ROOT, env=env,
        capture_output=True, text=True, timeout=900)
    train_log = tmp_path / "train_log.txt"
    assert proc.returncode == 0, (
        proc.stderr[-2000:] + "\n" +
        (train_log.read_text()[-2000:] if train_log.exists() else ""))
    for s in ("7", "8"):
        assert os.path.exists(
            os.path.join(run_dir, f"seed_{s}", "checkpoint.msgpack"))
    assert os.path.exists(os.path.join(run_dir, ".done"))

    # Simulate a session killed mid-campaign: checkpoints exist, .done not.
    os.remove(os.path.join(run_dir, ".done"))
    env["R5B_ITERS"] = "6"
    proc = subprocess.run(
        ["bash", "scripts/round5b_tpu_session.sh"], cwd=REPO_ROOT, env=env,
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (
        proc.stderr[-2000:] + "\n" + train_log.read_text()[-2000:])
    log_text = (tmp_path / "perf_log.txt").read_text()
    assert "(resuming from per-seed checkpoints" in log_text
    assert "Resumed 2-seed campaign at iteration 3" in train_log.read_text()
    for s in ("7", "8"):
        with open(os.path.join(run_dir, f"seed_{s}",
                               "checkpoint.msgpack.json")) as f:
            assert json.load(f)["iteration"] == 6
    assert "session done" in log_text


def test_round5c_scaling_probe_script_smoke(tiny_data_dir, tmp_path):
    """Drives scripts/round5c_scaling_probe.sh end-to-end on CPU with tiny
    settings: all four probes (n=1 plain single-seed path, n=2/3/6 vmapped
    campaigns) run through the real CLI and each probe's steady-state
    steps/s line lands in the session log."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update(
        GSCAN_JAX_PLATFORM="cpu",
        R5C_DATA=tiny_data_dir,
        R5C_LOG=str(tmp_path / "perf_log.txt"),
        R5C_ITERS="4", R5C_BATCH="16", R5C_PRINT="2",
        R5C_OUT=str(tmp_path / "probes"), R5C_CACHE="",
        R5C_EXTRA=TINY_MODEL_FLAGS + " --max_decoding_steps=20")
    proc = subprocess.run(
        ["bash", "scripts/round5c_scaling_probe.sh"], cwd=REPO_ROOT,
        env=env, capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-2000:]
    log_text = (tmp_path / "perf_log.txt").read_text()
    for name in ("n1", "n2", "n3", "n6"):
        assert "probe {}: ".format(name) in log_text, log_text
        log = tmp_path / "probes" / "{}.log".format(name)
        assert "steps/s" in log.read_text()


def test_round4c_decode_session_script_smoke(tiny_data_dir, tmp_path):
    """Drives scripts/round4c_decode_session.sh end-to-end on CPU: a tiny
    training produces the checkpoint, then both test-mode decodes (f32 and
    bfloat16_mixed) and the prediction diff run through the real CLI.  The
    identity rc is recorded, not asserted — a 6-iteration model's logits
    are near-ties, so bf16 flips are expected at this scale."""
    run_dir = str(tmp_path / "run")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update(GSCAN_JAX_PLATFORM="cpu")
    train = subprocess.run(
        ["python", "-m", "multimodal_seq2seq_gscan_tpu.cli.seq2seq",
         "--mode=train", f"--data_directory={tiny_data_dir}",
         f"--output_directory={run_dir}", "--conditional_attention",
         "--no_auxiliary_task", "--training_batch_size=32",
         "--max_training_iterations=6", "--seed=66",
         "--generate_vocabularies", "--evaluate_every=6", "--print_every=3",
         "--max_testing_examples=32", "--max_decoding_steps=20"]
        + TINY_MODEL_FLAGS.split(),
        cwd=REPO_ROOT, env=env, capture_output=True, text=True, timeout=600)
    assert train.returncode == 0, train.stderr[-2000:]
    env.update(
        R4C_DATA=tiny_data_dir,
        R4C_LOG=str(tmp_path / "perf_log.txt"),
        R4C_RUN=run_dir, R4C_SPLITS="dev", R4C_SKIP_AB="1",
        R4C_TMP=str(tmp_path / "r4c_tmp"),
        R4C_EXTRA=TINY_MODEL_FLAGS + " --max_decoding_steps=20")
    proc = subprocess.run(
        ["bash", "scripts/round4c_decode_session.sh"], cwd=REPO_ROOT,
        env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    for dt in ("float32", "bfloat16_mixed"):
        pred = tmp_path / "r4c_tmp" / f"identity_{dt}" / "dev_predict.json"
        assert pred.exists(), proc.stderr[-2000:]
        with open(pred) as f:
            assert len(json.load(f)) > 0
    log_text = (tmp_path / "perf_log.txt").read_text()
    assert "prediction identity" in log_text
    # The compare tool must have actually produced a per-pair report line —
    # the first TPU run of this session crashed inside the compare (on a
    # non-unique key) and the bare "identity rc=" assertion masked it.
    assert "prediction_mismatches=" in log_text
    assert "identity rc=" in log_text
    assert "session done" in log_text
