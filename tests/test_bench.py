"""Smoke test for bench.py — the driver's scoreboard must never crash.

Round 3 shipped a TypeError in bench_full_pipeline's internal run_stream
call that killed the measured run right after warmup, so the recorded
benchmark was a 300x regression while the pipeline itself was fine. The
scored path (bench_full_pipeline with a deadline, exactly as _run_benches
invokes it) now runs here on CPU every test run: one warmup + one
measured round over a 10-ZMW shard, asserting a nonzero throughput and
that the emitted JSON line is well-formed.
"""

import io
import json
import os
import time
from contextlib import redirect_stdout

import pytest

import bench


@pytest.fixture(autouse=True)
def _clean_partials(monkeypatch):
  monkeypatch.setattr(bench, '_partial', {})
  monkeypatch.setattr(bench, '_shared', {})
  # 1 shard copy (10 ZMWs/round) keeps the CPU smoke run short; the real
  # bench streams 5 copies to amortize tunnel latency.
  monkeypatch.setattr(bench, 'BIG_SHARD_COPIES', 1)
  monkeypatch.setenv('DC_BENCH_BATCH', '512')


def test_full_pipeline_scored_path():
  """The exact call shape _run_benches uses, including deadline=."""
  checkpoint = bench.ensure_checkpoint()
  assert os.path.exists(os.path.join(checkpoint, 'params.json'))
  rate = bench.bench_full_pipeline(
      checkpoint, rounds=1, lookahead=2, deadline=time.time() + 3600
  )
  assert rate > 0, bench._partial
  assert bench._partial['pipeline_rounds_done'] == 2  # warmup + measured
  assert bench._partial['zmws_per_sec'] > 0
  # The streamed FASTQ must hold real records (2 rounds x 10 ZMWs, minus
  # any filtered) — a crash mid-stream leaves it short or empty.
  with open('/tmp/bench_out/stream.fastq') as f:
    names = [line for line in f if line.startswith('@')]
  assert len(names) >= 10


def test_emit_json_line_shape():
  """One parseable JSON line with the driver's required fields."""
  buf = io.StringIO()
  with redirect_stdout(buf):
    bench._emit(12.5, {'stage': 'done', 'windows_per_sec_device': 31000.0})
  lines = [l for l in buf.getvalue().splitlines() if l.strip()]
  assert len(lines) == 1
  out = json.loads(lines[0])
  assert out['metric'] == 'zmws_per_sec_per_chip'
  assert out['value'] == 12.5
  assert out['unit'] == 'ZMW/s'
  assert out['vs_baseline'] == pytest.approx(12.5 / 0.76, abs=0.01)
  assert out['stage'] == 'done'
  assert 'error' not in out['stage']


def test_headline_value_fallback_is_separate_key():
  """`value` only ever carries a measured pipeline rate (advisor r4): a
  slow phase with only a windows/s measurement emits value 0.0 plus the
  estimate under `estimated_zmws_per_sec`; a finished pipeline round is
  reported directly with no estimate key."""
  extra = {'note': 'watchdog'}
  v = bench.headline_value({'windows_per_sec': 5567.6}, extra)
  assert v == 0.0
  assert extra['estimated_zmws_per_sec'] == pytest.approx(
      5567.6 / bench.WINDOWS_PER_ZMW, abs=0.01
  )
  assert 'estimated_zmws_per_sec' in extra['note'] and 'watchdog' in extra['note']

  extra = {}
  v = bench.headline_value(
      {'windows_per_sec': 5567.6, 'zmws_per_sec': 61.6}, extra
  )
  assert v == 61.6
  assert 'estimated_zmws_per_sec' not in extra

  assert bench.headline_value({}, {}) == 0.0
