"""AST lint enforcing the package precision invariant.

CLAUDE.md: f32/f64/complex matmuls must request ``Precision.HIGHEST`` —
on TPU an unqualified f32 matmul runs as bf16 passes (observed 6% relative
error on cancellation-heavy contractions before the invariant existed).
Tests execute on CPU float64 where the bug is invisible, so correctness
tests cannot catch a regression; this lint can.

Every ``jnp.einsum / matmul / dot / tensordot`` call in the package must
carry an explicit ``precision=`` keyword (or be the :func:`peinsum`
wrapper, which derives it from operand dtypes), and the bare ``@``
matrix-multiply operator is banned from package source entirely — it has
no way to specify precision.
"""

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parents[1] / "contractn_tpu"
CONTRACTING = {"einsum", "matmul", "dot", "tensordot"}

# The one definition site allowed to call jnp.einsum without the keyword:
# peinsum itself (it injects the precision via setdefault).
ALLOWED = {("ops/stabilize.py", "peinsum")}


def _violations():
    found = []
    for path in sorted(PKG.rglob("*.py")):
        rel = path.relative_to(PKG).as_posix()
        tree = ast.parse(path.read_text(), filename=str(path))
        # Map nodes to their enclosing function names for the allowlist
        parents = {}
        for parent in ast.walk(tree):
            for child in ast.iter_child_nodes(parent):
                parents[child] = parent

        def enclosing_func(node):
            cur = node
            while cur in parents:
                cur = parents[cur]
                if isinstance(cur, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    return cur.name
            return None

        for node in ast.walk(tree):
            if isinstance(node, ast.BinOp) and isinstance(node.op,
                                                          ast.MatMult):
                found.append(f"{rel}:{node.lineno}: bare '@' matmul")
            if not isinstance(node, ast.Call):
                continue
            fn = node.func
            if not (isinstance(fn, ast.Attribute)
                    and isinstance(fn.value, ast.Name)
                    and fn.value.id == "jnp"
                    and fn.attr in CONTRACTING):
                continue
            if (rel, enclosing_func(node)) in ALLOWED:
                continue
            kwargs = {kw.arg for kw in node.keywords}
            if "precision" not in kwargs:
                found.append(
                    f"{rel}:{node.lineno}: jnp.{fn.attr} without precision="
                )
    return found


def test_all_contractions_request_precision():
    violations = _violations()
    assert not violations, (
        "Unqualified contractions (add precision= or use "
        "ops.stabilize.peinsum):\n" + "\n".join(violations)
    )
