"""Tests for scripts/analyze_trace.py — the harness that produced BASELINE.md's
per-segment device-time table (round-4 profile-driven train-step attack).
A nesting bug in the self-time computation would silently mis-attribute the
profile, so the pure pieces are pinned here."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from analyze_trace import segment, self_times, summarize_device_ops  # noqa: E402


def _ev(name, ts, dur):
    return {"name": name, "ts": ts, "dur": dur}


def test_self_times_direct_children_only():
    # A [0,100] contains B [10,40] and C [60,20]; B contains D [15,10].
    # Grandchild D is charged to B, not to A.
    evs = [_ev("A", 0, 100), _ev("B", 10, 40), _ev("C", 60, 20), _ev("D", 15, 10)]
    got = dict(self_times(evs))
    assert got == {"A": 40.0, "B": 30.0, "C": 20.0, "D": 10.0}


def test_self_times_sequential_frames_do_not_nest():
    # back-to-back events: B starts exactly where A ends -> siblings
    evs = [_ev("A", 0, 50), _ev("B", 50, 30)]
    assert dict(self_times(evs)) == {"A": 50.0, "B": 30.0}


def test_self_times_repeated_names_accumulate_per_record():
    # two executions of the same op in one lane: two records, summed by caller
    evs = [_ev("op", 0, 10), _ev("op", 20, 15)]
    got = self_times(evs)
    assert sorted(got) == [("op", 10.0), ("op", 15.0)]


def test_self_times_unsorted_input_and_zero_dur():
    evs = [_ev("B", 10, 0), _ev("A", 0, 30)]
    got = dict(self_times(evs))
    assert got["A"] == 30.0 and got["B"] == 0.0


def test_self_times_child_longer_than_parent_clamps_to_zero():
    # malformed/rounded traces can report child dur > parent dur
    evs = [_ev("A", 0, 10), _ev("B", 1, 12)]
    got = dict(self_times(evs))
    assert got["A"] == 0.0  # clamped, never negative


def test_summarize_excludes_ops_outside_dominant_module(capsys):
    # Device timeline: dominant module jit_step runs twice ([0,100], [200,100]);
    # a second executable jit_eval runs once ([400,100]). Ops inside jit_eval
    # must NOT count toward the per-step numbers (they used to inflate them).
    pid_names = {7: "/device:TPU:0 (pid 7)"}
    tid_names = {(7, 1): "XLA Ops", (7, 2): "XLA Modules", (7, 3): "Steps"}

    def op(ts, dur, tf_op, cat="convolution"):
        return {"ph": "X", "pid": 7, "tid": 1, "ts": ts, "dur": dur,
                "name": "fusion", "args": {"tf_op": tf_op, "hlo_category": cat}}

    events = [
        {"ph": "X", "pid": 7, "tid": 2, "ts": 0, "dur": 100, "name": "jit_step(1)"},
        {"ph": "X", "pid": 7, "tid": 2, "ts": 200, "dur": 100, "name": "jit_step(1)"},
        {"ph": "X", "pid": 7, "tid": 2, "ts": 400, "dur": 100, "name": "jit_eval(2)"},
        # 10 us of dpt work per jit_step execution
        op(10, 10_000e-3, "jit(step)/dpt_depth/conv"),
        op(210, 10_000e-3, "jit(step)/dpt_depth/conv"),
        # 80 us of decode work inside jit_eval: must be excluded
        op(410, 80_000e-3, "jit(eval)/impl_network.decode/mlp"),
    ]
    summarize_device_ops(events, pid_names, tid_names)
    out = capsys.readouterr().out
    assert "dominant module: jit_step x2" in out
    # per-step DPT time = (10+10)/2 = 10 us = 0.01 ms
    assert "0.01 ms/step" in out and "DPT depth net (fwd)" in out
    # the eval decode op must not appear in the per-step table
    assert "implicit decode" not in out
    # ...but the exclusion is visible in the total-vs-dominant line
    assert "of which" in out and "inside the dominant module" in out


def test_segment_classification_fwd_bwd():
    assert segment("jit(step)/dpt_depth/conv") == "DPT depth net (fwd)"
    assert (
        segment("jit(step)/transpose(jvp(dpt_depth))/conv")
        == "DPT depth net (bwd)"
    )
    assert segment("jit(step)/impl_network.decode/mlp") == "implicit decode (fwd)"
    assert segment("jit(step)/something_else") == "other (fwd)"
