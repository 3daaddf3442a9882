"""Documentation build: executable notebooks + HTML site.

The reference renders its examples as executed notebooks through
Sphinx/nbsphinx (`/root/reference/docs/conf.py`); this build does the same
job with the tools available here: the percent-format example scripts are
converted to notebooks, EXECUTED against the real package (so every page
shows live outputs), and exported to HTML alongside the rendered index.

    python docs/build.py            # execute + render into docs/_build/
    python docs/build.py --fast     # skip execution (syntax-only render)
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import nbformat
from nbconvert import HTMLExporter
from nbconvert.preprocessors import ExecutePreprocessor

DOCS = Path(__file__).resolve().parent
REPO = DOCS.parent
BUILD = DOCS / "_build"


def percent_script_to_notebook(path: Path) -> nbformat.NotebookNode:
    """Parse a `# %%` percent-format script into a notebook."""
    nb = nbformat.v4.new_notebook()
    source = path.read_text().splitlines()
    cells: list[tuple[str, list[str]]] = []
    current_kind: str | None = None
    current: list[str] = []
    for line in source:
        stripped = line.strip()
        if stripped.startswith("# %%"):
            if current_kind is not None:
                cells.append((current_kind, current))
            current_kind = "markdown" if "[markdown]" in stripped else "code"
            current = []
        elif current_kind is not None:
            current.append(line)
    if current_kind is not None:
        cells.append((current_kind, current))

    for kind, lines in cells:
        text = "\n".join(lines).strip("\n")
        # notebooks have no __file__; the kernel runs with cwd = repo root
        text = text.replace("Path(__file__).resolve().parents[2]", "Path.cwd()")
        text = text.replace("Path(__file__).parents[2]", "Path.cwd()")
        if kind == "markdown":
            text = "\n".join(
                ln[2:] if ln.startswith("# ") else ln.lstrip("#") for ln in text.splitlines()
            )
            nb.cells.append(nbformat.v4.new_markdown_cell(text))
        elif text:
            nb.cells.append(nbformat.v4.new_code_cell(text))
    return nb


def _device_backend_usable(timeout_s: float = 120.0) -> bool:
    """A wedged TPU tunnel makes jax.devices() hang forever inside notebook
    kernels; probe it in a killable subprocess and fall back to CPU kernels
    (JAX_PLATFORMS handled by each example's own config preamble) so the
    docs always build."""
    import subprocess

    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        return False


def build(execute: bool = True) -> None:
    BUILD.mkdir(exist_ok=True)
    exporter = HTMLExporter()
    pages = []

    force_cpu = execute and not _device_backend_usable()
    if force_cpu:
        print("device backend unreachable; executing notebooks on CPU", flush=True)

    for script in sorted((DOCS / "examples").glob("*.py")):
        nb = percent_script_to_notebook(script)
        if force_cpu:
            # env vars alone cannot override this environment's
            # sitecustomize TPU plugin; only a pre-initialization config
            # update reliably selects the CPU backend in the kernel
            nb.cells.insert(
                0,
                nbformat.v4.new_code_cell(
                    "import jax\njax.config.update('jax_platforms', 'cpu')"
                ),
            )
        if execute:
            print(f"executing {script.name} ...", flush=True)
            ep = ExecutePreprocessor(timeout=1200, kernel_name="python3")
            ep.preprocess(nb, {"metadata": {"path": str(REPO)}})
        ipynb_out = DOCS / "examples" / (script.stem + ".ipynb")
        nbformat.write(nb, ipynb_out)
        html, _ = exporter.from_notebook_node(nb)
        page = BUILD / (script.stem + ".html")
        page.write_text(html)
        pages.append(page.name)
        print(f"rendered {page}")

    import markdown

    arch_md = (DOCS / "architecture.md").read_text()
    arch_body = markdown.markdown(arch_md, extensions=["tables", "fenced_code"])
    (BUILD / "architecture.html").write_text(
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        "<title>architecture</title>"
        "<style>body{font-family:sans-serif;max-width:52rem;margin:2rem auto;"
        "padding:0 1rem;line-height:1.5}</style></head><body>"
        f"{arch_body}</body></html>"
    )
    print(f"rendered {BUILD / 'architecture.html'}")

    index_md = (DOCS / "index.md").read_text()
    links = "\n".join(
        f'<li><a href="{p}">{p.removesuffix(".html").replace("_", " ")}</a></li>'
        for p in pages
    )
    body = markdown.markdown(index_md, extensions=["tables", "fenced_code"])
    (BUILD / "index.html").write_text(
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        "<title>arcadia-microscopy-tools-tpu</title>"
        "<style>body{font-family:sans-serif;max-width:52rem;margin:2rem auto;"
        "padding:0 1rem;line-height:1.5}</style></head><body>"
        f"{body}<h2>Executed examples</h2><ul>{links}</ul></body></html>"
    )
    print(f"rendered {BUILD / 'index.html'}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true", help="skip notebook execution")
    args = ap.parse_args()
    build(execute=not args.fast)
    sys.exit(0)
