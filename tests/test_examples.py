"""The examples/ scripts must at least stay syntactically valid and import
only things that exist (full runs are exercised manually / by their own
underlying test coverage — running them here would add minutes of compile
time for paths the suite already covers)."""

import ast
import pathlib

import pytest

EXAMPLES = sorted((pathlib.Path(__file__).parent.parent / "examples").glob("*.py"))


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.name)
def test_example_parses_and_names_resolve(path):
    tree = ast.parse(path.read_text(), str(path))
    # every `from clip_mixer_tpu...` import must resolve
    import importlib

    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module and node.module.startswith("clip_mixer_tpu"):
            mod = importlib.import_module(node.module)
            for alias in node.names:
                assert hasattr(mod, alias.name), f"{node.module}.{alias.name} missing"


def test_examples_exist():
    names = {p.name for p in EXAMPLES}
    assert {"zero_shot.py", "train_tiny.py", "serve_embed.py"} <= names
