#!/usr/bin/env python
"""Minimal first-party linter (ruff-parity stand-in for this environment).

The reference repo lints with ruff in CI (reference ci.yml:42); this image
has no linter installed and installs are forbidden, so `scripts/ci.sh`
runs ruff when available and falls back to this AST-based subset:

  * syntax errors (py_compile)
  * unused imports (ruff F401)
  * duplicate imports in one module (F811 for imports)
  * tabs in indentation / trailing whitespace (W191/W291)
  * lines > 120 chars (soft E501; repo style is ~79 but docstrings with
    reference citations run long)

Exit status 1 if any finding; prints ruff-style `path:line: code message`.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
TARGETS = ["qwen3_asr_tpu", "tests", "tools", "bench.py", "__graft_entry__.py"]
MAX_LINE = 120


def _imported_names(tree: ast.AST, module_level_only: bool = False):
    """Yield (name, lineno) for every import binding.

    ``module_level_only`` restricts to direct children of the module body —
    function-local imports are a deliberate lazy-import idiom here and are
    scoped, so they neither shadow (F811) nor count as module bindings.
    """
    nodes = tree.body if module_level_only else list(ast.walk(tree))
    for node in nodes:
        if isinstance(node, ast.Import):
            for alias in node.names:
                name = alias.asname or alias.name.split(".")[0]
                yield name, node.lineno
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for alias in node.names:
                if alias.name == "*":
                    continue
                yield (alias.asname or alias.name), node.lineno


def lint_file(path: Path) -> list[str]:
    findings: list[str] = []
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: E999 syntax error: {e.msg}"]

    # Unused imports: names bound by imports but never loaded.  A module
    # that declares __all__ or re-exports (package __init__) is exempt —
    # its imports ARE its API.
    is_facade = path.name == "__init__.py" or any(
        isinstance(n, ast.Assign)
        and any(getattr(t, "id", None) == "__all__" for t in n.targets)
        for n in ast.walk(tree)
    )
    if not is_facade:
        used: set[str] = set()
        for node in ast.walk(tree):
            if isinstance(node, ast.Name):
                used.add(node.id)
            elif isinstance(node, ast.Attribute):
                base = node
                while isinstance(base, ast.Attribute):
                    base = base.value
                if isinstance(base, ast.Name):
                    used.add(base.id)
        # Names referenced from string annotations under `from __future__
        # import annotations` (the repo-wide idiom).
        for node in ast.walk(tree):
            ann = getattr(node, "annotation", None) or (
                node.returns if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)) else None
            )
            if isinstance(ann, ast.Constant) and isinstance(ann.value, str):
                for tok in ann.value.replace("[", " ").replace("]", " ").replace(".", " ").split():
                    used.add(tok)
        for node in ast.walk(tree):
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.arg)):
                ann_src = []
                if isinstance(node, ast.arg) and node.annotation is not None:
                    ann_src.append(node.annotation)
                for ann in ann_src:
                    for sub in ast.walk(ann):
                        if isinstance(sub, ast.Name):
                            used.add(sub.id)
        seen: dict[str, int] = {}
        for name, lineno in _imported_names(tree, module_level_only=True):
            if name in seen and name != "_":
                findings.append(
                    f"{path}:{lineno}: F811 redefinition of imported '{name}' "
                    f"(first at line {seen[name]})"
                )
            seen.setdefault(name, lineno)
        for name, lineno in seen.items():
            if name not in used and not name.startswith("_"):
                findings.append(f"{path}:{lineno}: F401 '{name}' imported but unused")

    for i, line in enumerate(src.splitlines(), 1):
        stripped = line.rstrip("\n")
        indent = stripped[: len(stripped) - len(stripped.lstrip())]
        if "\t" in indent:
            findings.append(f"{path}:{i}: W191 tab in indentation")
        if stripped != stripped.rstrip():
            findings.append(f"{path}:{i}: W291 trailing whitespace")
        if len(stripped) > MAX_LINE:
            findings.append(f"{path}:{i}: E501 line too long ({len(stripped)} > {MAX_LINE})")
    return findings


def main() -> int:
    files: list[Path] = []
    for t in TARGETS:
        p = ROOT / t
        if p.is_dir():
            files.extend(sorted(p.rglob("*.py")))
        elif p.exists():
            files.append(p)
    all_findings: list[str] = []
    for f in files:
        all_findings.extend(lint_file(f))
    for line in all_findings:
        print(line)
    print(f"lint: {len(files)} files, {len(all_findings)} findings")
    return 1 if all_findings else 0


if __name__ == "__main__":
    sys.exit(main())
