"""Enforce the single-spelling platform-override convention (round-4 memo,
round-5 verdict #3): every CLI under ``scripts/`` that imports jax must
route platform selection through ``utils.common`` — either
``common_setup()`` (which calls the helper) or ``apply_platform_override()``
directly — and must NOT re-implement the override inline. The inline copy
in ``export_torch_checkpoint.py`` missed the round-4 rehearsal precisely
because the spelling was duplicated; this pins the invariant statically."""
import pathlib
import re

REPO = pathlib.Path(__file__).resolve().parent.parent

# The ONLY allowed definition site for the jax_platforms override.
HELPER = REPO / "virtex_tpu" / "utils" / "common.py"

# Deliberate, documented exceptions: unconditional CPU forcing by design
# (not the env-conditional override this convention governs).
ALLOWED_INLINE = {
    REPO / "bench" / "roofline_xcheck.py",   # always-CPU analytic xcheck
    REPO / "bench" / "scaling_bench.py",     # explicit --cpu flag, not env
}

IMPORTS_JAX = re.compile(r"^\s*(import jax\b|from jax\b)", re.MULTILINE)
INLINE_OVERRIDE = re.compile(
    r"jax\.config\.update\(\s*[\"']jax_platforms[\"']")
ROUTED = re.compile(r"common_setup\(|apply_platform_override\(")


def _py_files(*dirs):
    for d in dirs:
        yield from sorted((REPO / d).glob("*.py"))


def test_scripts_route_through_the_helper():
    offenders = []
    for path in list(_py_files("scripts")) + [REPO / "__graft_entry__.py"]:
        text = path.read_text()
        if not IMPORTS_JAX.search(text):
            continue
        if not ROUTED.search(text):
            offenders.append(f"{path.name}: imports jax but never calls "
                             f"common_setup()/apply_platform_override()")
    assert not offenders, "\n".join(offenders)


def test_no_inline_override_copies():
    offenders = []
    for path in (list(_py_files("scripts", "bench"))
                 + [REPO / "__graft_entry__.py", REPO / "bench.py"]):
        if path == HELPER or path in ALLOWED_INLINE:
            continue
        if INLINE_OVERRIDE.search(path.read_text()):
            offenders.append(str(path.relative_to(REPO)))
    assert not offenders, (
        f"inline jax_platforms override copies found (use "
        f"utils.common.apply_platform_override instead): {offenders}")


def test_helper_is_defined_once():
    assert INLINE_OVERRIDE.search(HELPER.read_text()), (
        "apply_platform_override lost its jax_platforms update")
