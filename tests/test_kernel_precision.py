"""Guard: every dot inside a Pallas kernel file pins an explicit precision.

Why this exists (r4): Mosaic lowers f32 ``dot_general``s with UNSET precision
to single-pass bf16 on the MXU, silently diverging from interpret mode and
from the CPU test suite (~1e-3/layer, compounding to ~0.19 rel logit error
at 7B depth).  CPU tests are structurally blind to it — this AST lint is the
only host-side tripwire; `experiments/tpu_selfcheck.py` is the on-hardware
one.

A dot is compliant if it either passes ``precision=...`` explicitly or its
call site is in the allowlist of deliberately-bf16 designs (documented
exact-by-construction operands, e.g. the magic-mantissa phase kernels whose
bf16 inputs are small integers).
"""

import ast
import pathlib

import pytest

OPS = pathlib.Path(__file__).resolve().parent.parent / "llama_swift_tpu" / "ops"

#: (filename, line) sites that are bf16 BY DESIGN with exact operands:
#:  - q4_matmul_pallas phase dots: weights are 16^p-scaled nibbles and
#:    activations are int-valued phase rows — exact in bf16; Precision.HIGHEST
#:    is set where the operands are f32 (lines with precision= already)
#:  - q4_dequant_pallas: the prefill dense matmul's dtype is an explicit
#:    ``mm_dtype`` parameter chosen by the caller (bf16 prefill is a
#:    documented speed/accuracy tradeoff, cfg.prefill_bf16)
#: keyed (file, enclosing function, dot name) so a NEW unpinned dot of a
#: different kind added to these functions is still flagged (r4 ADVICE: a
#: function-level key silently exempted any future dot in the function)
ALLOWLIST = {
    # magic-mantissa phase dot: both operands are exactly-representable
    # small-int-valued bf16 (w_p = 16^p-scaled nibbles, xp = int phase
    # rows); bf16 single-pass with f32 accumulation is exact by design
    ("q4_matmul_pallas.py", "_magic_core", "dot_general"),
}

DOT_NAMES = {"dot_general", "dot", "matmul", "einsum"}


def _dot_calls(tree):
    """Yield (node, funcname, enclosing function name) for dot-like calls."""
    parents = {}
    for parent in ast.walk(tree):
        for child in ast.iter_child_nodes(parent):
            parents[child] = parent

    def enclosing_fn(node):
        while node in parents:
            node = parents[node]
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                return node.name
        return "<module>"

    for node in ast.walk(tree):
        if not isinstance(node, ast.Call):
            continue
        fn = node.func
        name = fn.attr if isinstance(fn, ast.Attribute) else (
            fn.id if isinstance(fn, ast.Name) else None
        )
        if name in DOT_NAMES:
            yield node, name, enclosing_fn(node)


@pytest.mark.parametrize(
    "path", sorted(OPS.glob("*.py")), ids=lambda p: p.name
)
def test_kernel_dots_pin_precision(path):
    tree = ast.parse(path.read_text())
    offenders = []
    for node, name, fname in _dot_calls(tree):
        if any(kw.arg == "precision" for kw in node.keywords):
            continue
        if (path.name, fname, name) in ALLOWLIST:
            continue
        offenders.append(f"{path.name}:{node.lineno} {name} in {fname}()")
    assert not offenders, (
        "dot calls without an explicit precision= (Mosaic defaults f32 dots "
        "to single-pass bf16 on the MXU — see this test's docstring):\n  "
        + "\n  ".join(offenders)
    )
