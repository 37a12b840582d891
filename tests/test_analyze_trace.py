"""Tests for scripts/analyze_trace.py — the harness that produced BASELINE.md's
per-segment device-time table (round-4 profile-driven train-step attack).
A nesting bug in the self-time computation would silently mis-attribute the
profile, so the pure pieces are pinned here."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from analyze_trace import segment, self_times  # noqa: E402


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


def test_segment_classification_fwd_bwd():
    assert segment("jit(step)/dpt_depth/conv") == "DPT depth net (fwd)"
    assert (
        segment("jit(step)/transpose(jvp(dpt_depth))/conv")
        == "DPT depth net (bwd)"
    )
    assert segment("jit(step)/impl_network.decode/mlp") == "implicit decode (fwd)"
    assert segment("jit(step)/something_else") == "other (fwd)"
