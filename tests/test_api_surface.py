"""API-surface conformance: every public entry point of the reference
(SURVEY.md Appendix A) has a live equivalent at the documented location
(docs/PARITY.md).  This is the checklist test — it pins names, not
behavior (behavior is pinned by the per-module suites)."""

import numpy as np


def test_case_sensitivity():
    from alfred_margaret_tpu.utils.case import CASE_SENSITIVE, IGNORE_CASE, CaseSensitivity

    assert CaseSensitivity.from_json(CASE_SENSITIVE.to_json()) is CASE_SENSITIVE
    assert CaseSensitivity.from_json(IGNORE_CASE.to_json()) is IGNORE_CASE


def test_utf8_surface():
    from alfred_margaret_tpu.utils import utf8

    for name in [
        "length_utf8", "lower_str", "lower_code_point", "to_lower_ascii",
        "unlower_code_point", "print_unlowerings", "is_case_invariant",
        "unicode2utf8", "decode_code_point", "unsafe_index_code_point",
        "decode_utf8", "skip_code_points_backwards",
        "unsafe_cut_utf8", "unsafe_slice_utf8", "lower_transform",
        "decode_utf8_np", "raw_match_starts",
    ]:
        assert callable(getattr(utf8, name)), name
    assert utf8.length_utf8("𐍈") == 4


def test_ac_automaton_surface():
    from alfred_margaret_tpu.models import ac

    for name in [
        "build", "run_text", "run_lower", "run_with_case", "debug_build_dot",
        "needle_casings", "Match", "Done", "Step", "AcMachine",
        "count_matches", "all_matches", "save_npz", "load_npz",
    ]:
        assert hasattr(ac, name), name
    assert set(ac.needle_casings("k")) >= {"k", "K"}


def test_composed_case_dfa_surface():
    from alfred_margaret_tpu.models import case_dfa

    for name in ["compose_build", "eligible", "max_raw_match_bytes"]:
        assert callable(getattr(case_dfa, name)), name


def test_searcher_surface():
    from alfred_margaret_tpu import Searcher
    from alfred_margaret_tpu.utils.case import CASE_SENSITIVE

    s = Searcher.build(CASE_SENSITIVE, ["ab"])
    for name in [
        "build", "build_with_values", "build_needle_id_searcher",
        "contains_any", "contains_all", "count_matches", "all_matches",
        "needles", "num_needles", "case_sensitivity", "automaton",
        "map_searcher", "set_case_sensitivity", "to_json", "from_json",
        "stage", "distributed",
    ]:
        assert hasattr(s, name), name
    assert (s + Searcher.build(CASE_SENSITIVE, ["cd"])).num_needles == 2


def test_replacer_surface():
    from alfred_margaret_tpu import Replacer
    from alfred_margaret_tpu.replacer import MAX_BOUND, Payload
    from alfred_margaret_tpu.utils.case import CASE_SENSITIVE

    r = Replacer.build(CASE_SENSITIVE, [("a", "b")])
    for name in [
        "run", "run_with_limit", "compose", "map_replacement",
        "set_case_sensitivity", "case_sensitivity", "to_json", "from_json",
    ]:
        assert hasattr(r, name), name
    assert Payload(0, 1, 1, b"x").needle_replacement == b"x"
    assert MAX_BOUND == 2**63 - 1


def test_splitter_surface():
    from alfred_margaret_tpu import Splitter

    sp = Splitter.build(",")
    for name in [
        "split", "split_ignore_case", "split_reverse",
        "split_reverse_ignore_case", "separator", "automaton",
        "to_json", "from_json",
    ]:
        assert hasattr(sp, name), name


def test_boyer_moore_surface():
    from alfred_margaret_tpu.boyer_moore import automaton as bma
    from alfred_margaret_tpu.boyer_moore import replacer as bmr
    from alfred_margaret_tpu.boyer_moore import searcher as bms

    a = bma.build_automaton("needle")
    assert bma.pattern_length(a) == 6
    assert bma.pattern_text(a) == b"needle"
    assert callable(bma.run_text)
    assert callable(bmr.replace_single_limited)
    s = bms.Searcher.build(["a", "b"])
    assert s.contains_any(b"xa")


def test_boyer_moore_ci_surface():
    from alfred_margaret_tpu.boyer_moore_ci import automaton as bmca
    from alfred_margaret_tpu.boyer_moore_ci import replacer as bmcr
    from alfred_margaret_tpu.boyer_moore_ci import searcher as bmcs

    a = bmca.build_automaton("straße")
    assert callable(bmca.run_text)
    assert bmca.minimum_skip_for_code_point(ord("k")) >= 1
    assert callable(bmcr.replace_single_limited)
    assert bmcs.Searcher.build(["k"]).contains_any("KELVIN")


def test_parallel_surface():
    from alfred_margaret_tpu.parallel import (
        DistributedAcEngine,
        init_distributed,
        make_mesh,
    )

    assert callable(DistributedAcEngine)
    assert callable(init_distributed)
    assert callable(make_mesh)


def test_cli_and_bench_surface():
    from alfred_margaret_tpu.cli import main as cli_main
    from alfred_margaret_tpu.bench import configs, micro, naive, report  # noqa: F401
    from alfred_margaret_tpu.bench.countmatches import main as cm_main

    assert callable(cli_main)
    assert callable(cm_main)


def test_engine_knobs():
    from alfred_margaret_tpu.utils.config import DEFAULT, EngineConfig

    assert isinstance(DEFAULT, EngineConfig)
    for field in ("engine", "n_streams", "t_tile", "interpret", "validate",
                  "composed_ci_max_states"):
        assert hasattr(DEFAULT, field), field
