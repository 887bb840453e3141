"""CLI flag-surface parity: the north star mandates the reference's
``main.py`` train / ``report.py`` eval flag surface be preserved verbatim
(BASELINE.json; reference argparse at ``/root/reference/main.py:139-231``
and ``report.py:236-268``).

These tests extract every option string and every ``choices=`` value the
REFERENCE's parsers declare — by parsing its source with ``ast``, so new
reference flags would be picked up automatically — and assert each one is
accepted by the rebuild's ``--help``. Extensions beyond the reference
(``--resume``, ``--tp``, ...) are allowed; dropping or renaming a
reference flag is a regression this guards against.
"""

import ast
import os
import subprocess
import sys

import pytest

REPO = os.path.join(os.path.dirname(__file__), os.pardir)
REFERENCE = "/root/reference"


def _reference_flags(fname):
    """All option strings + choices the reference's argparse declares."""
    path = os.path.join(REFERENCE, fname)
    if not os.path.exists(path):
        pytest.skip(f"reference {fname} not available")
    tree = ast.parse(open(path).read())
    flags, choices = [], []
    for node in ast.walk(tree):
        if not (isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "add_argument"):
            continue
        for arg in node.args:
            if isinstance(arg, ast.Constant) and str(arg.value).startswith("-"):
                flags.append(arg.value)
        for kw in node.keywords:
            if kw.arg == "choices" and isinstance(kw.value, ast.List):
                choices += [e.value for e in kw.value.elts
                            if isinstance(e, ast.Constant)]
    assert flags, f"no flags extracted from reference {fname}"
    return flags, choices


def _declared_defaults(path):
    """Map of long option string -> literal default= value, via ast."""
    tree = ast.parse(open(path).read())
    defaults = {}
    for node in ast.walk(tree):
        if not (isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "add_argument"):
            continue
        opts = [a.value for a in node.args
                if isinstance(a, ast.Constant) and str(a.value).startswith("-")]
        if not opts:
            continue
        for kw in node.keywords:
            if kw.arg == "default" and isinstance(kw.value, ast.Constant):
                defaults[opts[-1]] = kw.value.value  # last = long form
    return defaults


def _help_text(script):
    out = subprocess.run([sys.executable, script, "--help"],
                         cwd=REPO, capture_output=True, text=True,
                         env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr
    return out.stdout


@pytest.mark.parametrize("script", ["main.py", "report.py"])
def test_reference_flag_surface_preserved(script):
    flags, choices = _reference_flags(script)
    text = _help_text(os.path.join(REPO, script))
    missing = [f for f in flags if f not in text]
    assert not missing, f"{script} dropped reference flags: {missing}"
    # every reference enum value (model names, loss types, schedules)
    missing_choices = [c for c in choices if c not in text]
    assert not missing_choices, \
        f"{script} dropped reference choices: {missing_choices}"


@pytest.mark.parametrize("script", ["main.py", "report.py"])
def test_reference_flag_defaults_preserved(script):
    """Every literal default the reference declares must be declared
    identically by the rebuild (e.g. epochs 200, batch-size 8 train /
    2 report, val-epochs 10, precision '32', the 1,2,4,8x5 channel
    mults) — a silently changed default would alter behaviour for users
    migrating with reference muscle memory."""
    ref_path = os.path.join(REFERENCE, script)
    if not os.path.exists(ref_path):
        pytest.skip(f"reference {script} not available")
    ref = _declared_defaults(ref_path)
    ours = _declared_defaults(os.path.join(REPO, script))
    assert ref, f"no defaults extracted from reference {script}"
    mismatched = {
        flag: (ref[flag], ours.get(flag, "<missing>"))
        for flag in ref
        if flag not in ours or ours[flag] != ref[flag]
    }
    assert not mismatched, f"{script} default drift: {mismatched}"
