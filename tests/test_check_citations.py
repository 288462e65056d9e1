"""The citation checker must catch evidence paths cited WITHOUT backticks.

Round 4 shipped docs/CLI.md citing "(A/B: results/round4_rams/ema_ab.json)"
before that file existed; scripts/check_citations.py only verified
backticked paths, so the phantom citation passed (VERDICT r4 Weak #2 /
Next #2). These tests pin the fix: a bare results/ logs/ artifacts/ path in
any repo doc must exist on disk.
"""
import importlib.util
import os

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "check_citations",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "check_citations.py"),
)
cc = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(cc)


@pytest.fixture
def fake_repo(tmp_path, monkeypatch):
    (tmp_path / "docs").mkdir()
    monkeypatch.setattr(cc, "REPO", str(tmp_path))
    return tmp_path


def test_phantom_bare_evidence_path_is_flagged(fake_repo):
    # exactly the round-4 failure shape: non-backticked citation in a doc
    (fake_repo / "docs" / "CLI.md").write_text(
        "weight EMA (A/B: results/round4_rams/ema_ab.json)\n")
    failures = cc.check_bare_evidence_paths()
    assert len(failures) == 1
    assert "results/round4_rams/ema_ab.json" in failures[0]


def test_existing_evidence_path_passes(fake_repo):
    d = fake_repo / "results" / "round4_rams"
    d.mkdir(parents=True)
    (d / "ema_ab.json").write_text("{}")
    (fake_repo / "docs" / "CLI.md").write_text(
        "weight EMA (A/B: results/round4_rams/ema_ab.json)\n")
    assert cc.check_bare_evidence_paths() == []


def test_phantom_glob_citation_is_flagged(fake_repo):
    # the round-5 failure shape: a wildcard citation that matches nothing
    (fake_repo / "docs" / "R.md").write_text(
        "see results/round5_wire/sweep_extra*.json for the rest\n")
    failures = cc.check_bare_evidence_paths()
    assert len(failures) == 1
    assert "sweep_extra*" in failures[0]


def test_glob_citation_with_matches_passes(fake_repo):
    d = fake_repo / "results" / "round5_wire"
    d.mkdir(parents=True)
    (d / "sweep_extra1.json").write_text("{}")
    (fake_repo / "docs" / "R.md").write_text(
        "see results/round5_wire/sweep_extra*.json for the rest\n")
    assert cc.check_bare_evidence_paths() == []


def test_judge_authored_docs_are_exempt(fake_repo):
    (fake_repo / "VERDICT.md").write_text(
        "cites results/never/made.json on purpose\n")
    assert cc.check_bare_evidence_paths() == []


def test_real_repo_docs_are_clean():
    real = importlib.util.module_from_spec(_SPEC)
    _SPEC.loader.exec_module(real)
    assert real.check_bare_evidence_paths() == []
