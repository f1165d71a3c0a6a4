"""KG construction over SOURCE-CODE repository tables — the
``(repo, path, commit, lang, content)`` input shape (BASELINE.json
input_hint) driven to (subj, pred, obj) triples with the same
Spark-first discipline as the linguistics pipeline: row-local native
regex extraction (no Python in the hot path), explode, window-over-hash
dedup via the shared triple machinery.

Two edge families demonstrate the shape end-to-end:

  * imports-module:   file --imports-->  module   (python ``import x`` /
    ``from x import``, java/go-style ``import a.b.c;``)
  * defines-symbol:   file --defines-->  symbol   (python top-level
    ``def``/``class`` declarations)

Both extractors are single-pass ``regexp_extract_all`` projections —
whole-stage-codegen'd, zero shuffle before the dedup — and the regex
subset is shared by Java (Spark) and RE2 (DuckDB), so every operator is
oracle-checkable the same way the text operators are.

At 10^12 files: extraction is embarrassingly parallel (row-local); the
only shuffles are the final distincts on the uniform (path, object)
pair keys. Per-language dispatch is a column predicate — no UDF, no
per-language job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: language → module-import patterns (group 1 = module). Kept to the
#: Java∩Python-re regex subset (the oracle re-applies them with ``re``);
#: multiline flag via inline (?m).
_IMPORT_PATTERNS = {
    "python": [
        r"(?m)^import ([A-Za-z_][A-Za-z0-9_.]*)",
        r"(?m)^from ([A-Za-z_][A-Za-z0-9_.]*) import ",
    ],
    "java": [r"(?m)^import (?:static )?([A-Za-z_][A-Za-z0-9_.]*);"],
    "go": [r"(?m)^import \"([^\"]+)\""],
}

_DEFINE_PATTERNS = {
    "python": [
        r"(?m)^def ([A-Za-z_][A-Za-z0-9_]*)",
        r"(?m)^class ([A-Za-z_][A-Za-z0-9_]*)",
    ],
}

#: language → comment/string-literal strip patterns, applied IN ORDER to
#: the content before extraction so a docstring or block comment holding
#: a line that starts with ``import``/``def`` cannot mint a false edge
#: (the ``^`` anchor alone only excludes indented and ``#``-prefixed
#: lines). Regex-level stripping, not a lexer: a quote character INSIDE
#: a string literal can still fool it (documented shape limit; the
#: triple-quote patterns are non-greedy so consecutive docstrings don't
#: merge). Same Java∩Python-re subset as the extraction patterns.
_STRIP_PATTERNS = {
    "python": [
        '(?s)"""' + r".*?" + '"""',  # docstrings / triple-quoted strings
        r"(?s)'''.*?'''",
        r"(?m)#.*$",  # line comments
    ],
    "java": [r"(?s)/\*.*?\*/", r"(?m)//.*$"],
    "go": [r"(?s)/\*.*?\*/", r"(?m)//.*$", r"(?s)`[^`]*`"],  # + raw strings
}


def _extract_exploded(
    files: DataFrame, patterns: dict, out_col: str, content_col: str
) -> DataFrame:
    """Per-language regexp_extract_all union: each (lang, pattern) pair
    is a row-local projection filtered by the lang predicate, applied to
    the comment/string-stripped content; patterns of the same language
    union BEFORE the explode so a file yields one row per (file, match)
    with no duplicate scans (the source is the same single scan —
    Catalyst collapses the union branches into one pass over each
    language partition)."""
    branches = []
    for lang, pats in patterns.items():
        stripped = F.col(content_col)
        for sp in _STRIP_PATTERNS.get(lang, ()):
            stripped = F.regexp_replace(stripped, sp, "")
        arrs = [
            F.regexp_extract_all(stripped, F.lit(p), F.lit(1)) for p in pats
        ]
        merged = arrs[0] if len(arrs) == 1 else F.concat(*arrs)
        branches.append(
            files.where(F.col("lang") == lang).select(
                "repo", "path", "lang", F.explode(merged).alias(out_col)
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out.distinct()


def import_edges(files: DataFrame, content_col: str = "content") -> DataFrame:
    """(repo, path, lang, module) — one row per distinct import of a
    module by a source file. Returns the 'file --imports--> module'
    edge family of the code KG."""
    return _extract_exploded(files, _IMPORT_PATTERNS, "module", content_col)


def defined_symbols(files: DataFrame, content_col: str = "content") -> DataFrame:
    """(repo, path, lang, symbol) — top-level definition declarations
    per file: the 'file --defines--> symbol' edge family."""
    return _extract_exploded(files, _DEFINE_PATTERNS, "symbol", content_col)


def code_triples(files: DataFrame, content_col: str = "content") -> DataFrame:
    """Name-level (subj, pred, obj) triples of the code KG — the same
    output surface as the linguistics pipeline's ``triples_view``, so a
    consumer reads both graphs identically. The subject is the
    repo-qualified file id ``repo/path`` — two repos holding the same
    path (every repo's src/main.go importing fmt) are distinct files and
    must stay distinct subjects. Deterministic ordering-free set; dedup
    is the distinct inside each family at (repo, path, obj) grain."""
    subj = F.concat_ws("/", F.col("repo"), F.col("path")).alias("subj")
    imports = import_edges(files, content_col).select(
        subj,
        F.lit("imports-module").alias("pred"),
        F.col("module").alias("obj"),
    )
    defines = defined_symbols(files, content_col).select(
        subj,
        F.lit("defines-symbol").alias("pred"),
        F.col("symbol").alias("obj"),
    )
    return imports.unionByName(defines)


# ---------------------------------------------------------------------------
# deterministic synthetic source-repo table (tests / oracle gate)
# ---------------------------------------------------------------------------

def synthetic_source_files(n: int = 24) -> list:
    """Deterministic (repo, path, commit, lang, content) rows — the
    BASELINE.json input_hint shape — cycling python/java/go files with
    known imports and definitions. Pure Python so the DuckDB oracle can
    render the identical table as a VALUES CTE. Baked-in traps the gate
    must NOT extract: comment/indented/docstring imports (python), block
    comment + import-bearing string constant (java/go); plus the SAME
    path in every repo (src/shared.py) so the gate fails if subjects
    ever conflate files across repos again."""
    rows = []
    for i in range(n):
        lang = ["python", "java", "go"][i % 3]
        repo = f"repo{i % 4}"
        if lang == "python":
            path = f"src/mod_{i}.py"
            content = (
                f"import os\nimport util_{i % 5}\n"
                f"from pkg_{i % 3}.sub import thing\n"
                f"def fn_{i}(x):\n    return x\n"
                f"class Cls_{i}:\n    pass\n"
                "# import commented_out\n"
                "  import indented_ignored\n"
                '"""module docstring\nimport docstring_trap\ndef doc_trap():\n"""\n'
            )
        elif lang == "java":
            path = f"src/Main_{i}.java"
            content = (
                f"package app;\nimport java.util.List;\n"
                f"import static org.lib_{i % 5}.Util.helper;\n"
                "/*\nimport block.comment.Trap;\n*/\n"
                "// import line.comment.Trap;\n"
                f"public class Main_{i} {{}}\n"
            )
        else:
            path = f"src/main_{i}.go"
            content = (
                f'package main\nimport "fmt"\nimport "example.com/dep_{i % 5}"\n'
                "/*\nimport \"block/comment/trap\"\n*/\n"
                'var doc = `raw string\nimport "raw/string/trap"\n`\n'
                f"func main_{i}() {{}}\n"
            )
        rows.append((repo, path, f"c{i:04d}", lang, content))
    # the ADVICE counterexample: identical path in two different repos —
    # distinct files, distinct subjects, same imported module
    for repo in ("repo0", "repo1"):
        rows.append(
            (repo, "src/shared.py", "c9999", "python",
             "import shared_common\ndef shared_fn():\n    pass\n")
        )
    return rows
