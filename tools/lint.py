"""Dependency-free linter for `make lint`.

The usual tools (ruff, pyright) are not installable in this environment, so
this implements the checks that matter most for this codebase as AST/text
passes: syntax (compileall), unused imports, `__all__` names that don't
exist, bare excepts, mutable default arguments, tabs, trailing whitespace,
and over-long lines. CI (.github/workflows/lint.yml) runs ruff + pyright on
top of this when dependencies are available.

    python tools/lint.py [paths...]   # default: package + tests + tools
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

MAX_LINE = 100
REPO = Path(__file__).resolve().parent.parent
DEFAULT_PATHS = [
    "arcadia_microscopy_tools_tpu", "tests", "tests_tpu", "tools",
    "bench.py", "__graft_entry__.py",
]


def iter_files(paths: list[str]) -> list[Path]:
    out: list[Path] = []
    for p in paths:
        path = REPO / p
        if path.is_dir():
            out.extend(sorted(path.rglob("*.py")))
        elif path.suffix == ".py":
            out.append(path)
    return out


class Visitor(ast.NodeVisitor):
    def __init__(self) -> None:
        self.imports: dict[str, int] = {}  # name -> lineno
        self.used: set[str] = set()
        self.problems: list[tuple[int, str]] = []
        self.all_names: list[str] = []
        self.defined: set[str] = set()

    def visit_Import(self, node: ast.Import) -> None:
        for alias in node.names:
            name = (alias.asname or alias.name).split(".")[0]
            self.imports[name] = node.lineno
        self.generic_visit(node)

    def visit_ImportFrom(self, node: ast.ImportFrom) -> None:
        if node.module == "__future__":
            return
        for alias in node.names:
            if alias.name == "*":
                continue
            self.imports[alias.asname or alias.name] = node.lineno
        self.generic_visit(node)

    def visit_Name(self, node: ast.Name) -> None:
        if isinstance(node.ctx, ast.Load):
            self.used.add(node.id)
        else:
            self.defined.add(node.id)
        self.generic_visit(node)

    def visit_Attribute(self, node: ast.Attribute) -> None:
        root = node
        while isinstance(root, ast.Attribute):
            root = root.value  # type: ignore[assignment]
        if isinstance(root, ast.Name):
            self.used.add(root.id)
        self.generic_visit(node)

    def visit_ExceptHandler(self, node: ast.ExceptHandler) -> None:
        if node.type is None:
            self.problems.append((node.lineno, "bare 'except:' (catch something specific)"))
        self.generic_visit(node)

    def _check_defaults(self, node: ast.FunctionDef | ast.AsyncFunctionDef) -> None:
        for default in list(node.args.defaults) + [
            d for d in node.args.kw_defaults if d is not None
        ]:
            if isinstance(default, (ast.List, ast.Dict, ast.Set)):
                self.problems.append(
                    (default.lineno, f"mutable default argument in {node.name}()")
                )
        self.defined.add(node.name)

    def visit_FunctionDef(self, node: ast.FunctionDef) -> None:
        self._check_defaults(node)
        self.generic_visit(node)

    def visit_AsyncFunctionDef(self, node: ast.AsyncFunctionDef) -> None:
        self._check_defaults(node)
        self.generic_visit(node)

    def visit_ClassDef(self, node: ast.ClassDef) -> None:
        self.defined.add(node.name)
        self.generic_visit(node)

    def visit_Assign(self, node: ast.Assign) -> None:
        for target in node.targets:
            if isinstance(target, ast.Name) and target.id == "__all__":
                if isinstance(node.value, (ast.List, ast.Tuple)):
                    self.all_names = [
                        elt.value
                        for elt in node.value.elts
                        if isinstance(elt, ast.Constant) and isinstance(elt.value, str)
                    ]
        self.generic_visit(node)


def lint_file(path: Path) -> list[str]:
    problems: list[str] = []
    text = path.read_text()

    for i, line in enumerate(text.splitlines(), start=1):
        if "\t" in line:
            problems.append(f"{path}:{i}: tab character")
        if line != line.rstrip():
            problems.append(f"{path}:{i}: trailing whitespace")
        if len(line) > MAX_LINE and "http" not in line:
            problems.append(f"{path}:{i}: line longer than {MAX_LINE} chars ({len(line)})")

    try:
        tree = ast.parse(text, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]

    visitor = Visitor()
    visitor.visit(tree)
    for lineno, msg in visitor.problems:
        problems.append(f"{path}:{lineno}: {msg}")

    # unused imports (re-export modules with __all__ legitimately import names
    # they list; noqa comments opt out)
    lines = text.splitlines()
    for name, lineno in visitor.imports.items():
        if name in visitor.used or name in visitor.all_names or name == "_":
            continue
        line = lines[lineno - 1] if lineno - 1 < len(lines) else ""
        if "noqa" in line or (lineno - 2 >= 0 and "noqa" in lines[lineno - 2]):
            continue
        problems.append(f"{path}:{lineno}: unused import '{name}'")

    for name in visitor.all_names:
        if name not in visitor.defined and name not in visitor.imports:
            problems.append(f"{path}:1: __all__ lists undefined name '{name}'")

    return problems


def main() -> int:
    paths = sys.argv[1:] or DEFAULT_PATHS
    all_problems: list[str] = []
    files = iter_files(paths)
    for path in files:
        all_problems.extend(lint_file(path))
    for problem in all_problems:
        print(problem)
    print(f"lint: {len(files)} files, {len(all_problems)} problems")
    return 1 if all_problems else 0


if __name__ == "__main__":
    sys.exit(main())
