"""KG construction over SOURCE-CODE repository tables — the
``(repo, path, commit, lang, content)`` input shape (BASELINE.json
input_hint) driven to (subj, pred, obj) triples with the same
Spark-first discipline as the linguistics pipeline: row-local native
regex extraction (no Python in the hot path), explode, window-over-hash
dedup via the shared triple machinery.

Three edge families demonstrate the shape end-to-end, across eight
languages (python, java, go, javascript, typescript, rust, c, cpp):

  * imports-module:    file --imports-->  module  (``import``/``from``/
    ``use``/``require``/``#include`` per language; go grouped
    ``import ( ... )`` blocks via a nested block→member pattern)
  * defines-symbol:    file --defines-->  symbol  (top-level ``def``/
    ``class``/``func``/``fn``/``struct``/``interface`` declarations;
    round 7 adds C/C++ function signatures incl. out-of-class
    ``::methods``, java method definitions, js/ts arrow-function consts
    and TS type aliases — every language emits all families where the
    construct exists)
  * declares-package:  file --declares--> package (go/java ``package``,
    rust ``mod``)

All extractors are single-pass ``regexp_extract_all`` projections —
whole-stage-codegen'd, zero shuffle before the dedup — and the regex
subset is shared by Java (Spark) and Python ``re`` (the oracle), so
every operator is oracle-checkable the same way the text operators are.
Extraction is regex-level, not a lexer: comments and the raw-string /
template-literal forms are stripped first (``_STRIP_PATTERNS``), but a
quote character inside a string literal can still fool it — the
documented shape limit shared with the strip pass.

At 10^12 files: extraction is embarrassingly parallel (row-local); the
only shuffles are the final distincts on the uniform (path, object)
pair keys. Per-language dispatch is a column predicate — no UDF, no
per-language job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: javascript/typescript share one grammar surface for this extraction
#: (TS adds ``interface``/``type`` declarations, harmless on JS input)
_JS_IMPORTS = [
    # `import x from 'y'` / `import {a, b} from "y"` / bare `import 'y'`
    r"(?m)^import [^'\"\n]*['\"]([^'\"\n]+)['\"]",
    # top-level `const x = require('y')` (and let/var/export const)
    r"(?m)^(?:export )?(?:const|let|var) [^=\n]*= require\(['\"]([^'\"\n]+)['\"]\)",
]
_JS_DEFINES = [
    r"(?m)^(?:export )?(?:default )?(?:async )?function ([A-Za-z_$][A-Za-z0-9_$]*)",
    r"(?m)^(?:export )?(?:default )?(?:abstract )?class ([A-Za-z_$][A-Za-z0-9_$]*)",
    r"(?m)^(?:export )?interface ([A-Za-z_$][A-Za-z0-9_$]*)",
    # round 7: arrow-function consts — `export const f = () =>`,
    # `const g = async x =>`, with an optional TS type annotation before
    # the `=`; a plain `const n = 42` has no `=>` and never matches
    r"(?m)^(?:export )?(?:const|let|var) ([A-Za-z_$][A-Za-z0-9_$]*)"
    r"\s*(?::[^=\n]+)?=\s*(?:async )?(?:\([^)\n]*\)|[A-Za-z_$][A-Za-z0-9_$]*)\s*=>",
    # TS type aliases (syntax error on real JS input, so harmless shared)
    r"(?m)^(?:export )?type ([A-Za-z_$][A-Za-z0-9_$]*)\s*=",
]

#: C/C++ top-level function shape: optional storage/type qualifiers, a
#: return-type token (pointer stars allowed), then the captured name at
#: an open paren. `(?!typedef\b)` keeps function-POINTER typedefs out
#: (`typedef int (*cb)(void);` — the round-6 VERDICT trap). Granularity
#: is declaration-level: a prototype `int f(int);` names the symbol the
#: same way the definition does, and both extract (documented; a
#: regex-level extractor cannot see bodies across lines).
_C_FUNC = (
    r"(?m)^(?!typedef\b)(?:static |inline |extern |unsigned |signed |const )*"
    r"[A-Za-z_][A-Za-z0-9_]*[ \t*]+\*?([A-Za-z_][A-Za-z0-9_]*)\s*\("
)
#: C++ adds `virtual` and out-of-class `Type Class::method(` definitions
#: (the capture is the method name; constructors `T::T(` have no return
#: type token and stay out — documented shape limit)
_CPP_FUNC = (
    r"(?m)^(?!typedef\b)(?:static |inline |extern |unsigned |signed |const |virtual )*"
    r"[A-Za-z_][A-Za-z0-9_]*[ \t*&]+\*?(?:[A-Za-z_][A-Za-z0-9_]*::)?"
    r"([A-Za-z_][A-Za-z0-9_]*)\s*\("
)

#: language → module-import patterns (EXACTLY one capture group = the
#: module: multi-group patterns would break both ``regexp_extract_all``'s
#: group index and the oracle's ``re.findall``). Kept to the
#: Java∩Python-re regex subset (the oracle re-applies them with ``re``);
#: multiline flag via inline (?m). A ``(NESTED, outer, inner)`` tuple
#: extracts outer-group-1 block bodies first, then inner-group-1 members
#: within each block — go's grouped ``import ( ... )`` form.
NESTED = "nested"
_IMPORT_PATTERNS = {
    "python": [
        r"(?m)^import ([A-Za-z_][A-Za-z0-9_.]*)",
        r"(?m)^from ([A-Za-z_][A-Za-z0-9_.]*) import ",
    ],
    "java": [r"(?m)^import (?:static )?([A-Za-z_][A-Za-z0-9_.]*);"],
    "go": [
        r"(?m)^import \"([^\"]+)\"",
        # grouped form: every quoted member inside `import ( ... )`
        (NESTED, r"(?sm)^import \(([^)]*)\)", r"\"([^\"\n]+)\""),
    ],
    "javascript": _JS_IMPORTS,
    "typescript": _JS_IMPORTS,
    "rust": [
        r"(?m)^use ([A-Za-z_][A-Za-z0-9_]*(?:::[A-Za-z_][A-Za-z0-9_]*)*)",
        r"(?m)^extern crate ([A-Za-z_][A-Za-z0-9_]*)",
    ],
    "c": [r"(?m)^# *include *[<\"]([^>\"\n]+)[>\"]"],
    "cpp": [r"(?m)^# *include *[<\"]([^>\"\n]+)[>\"]"],
}

_DEFINE_PATTERNS = {
    "python": [
        r"(?m)^def ([A-Za-z_][A-Za-z0-9_]*)",
        r"(?m)^class ([A-Za-z_][A-Za-z0-9_]*)",
    ],
    "java": [
        r"(?m)^(?:public |final |abstract ){0,3}(?:class|interface|enum) ([A-Za-z_][A-Za-z0-9_$]*)",
        # round 7: method definitions — indented, optional modifiers, a
        # return-type token (generics/arrays in the type charset), the
        # captured name, a `;`-free parameter list, and the opening
        # brace on the same line (calls end `;`, so they never match);
        # `(?!new\s|return\s)` keeps `new Runnable() {` and
        # `return new Builder() {` out. Constructors (no return type)
        # and multi-token generic types (`Map<String, Integer>`) are
        # the documented shape limits.
        r"(?m)^[ \t]+(?:(?:public|private|protected|static|final|synchronized|abstract|native|default)\s+)*"
        r"(?!new\s|return\s)[A-Za-z_][A-Za-z0-9_$<>\[\]]*\s+"
        r"([A-Za-z_][A-Za-z0-9_$]*)\s*\([^;(){}]*\)\s*\{",
    ],
    "go": [
        # methods keep their name, the `(recv T)` receiver is skipped
        r"(?m)^func (?:\([^)\n]*\) )?([A-Za-z_][A-Za-z0-9_]*)",
        r"(?m)^type ([A-Za-z_][A-Za-z0-9_]*)",
    ],
    "javascript": _JS_DEFINES,
    "typescript": _JS_DEFINES,
    "rust": [
        r"(?m)^(?:pub(?:\([a-z]*\))? )?fn ([A-Za-z_][A-Za-z0-9_]*)",
        r"(?m)^(?:pub(?:\([a-z]*\))? )?(?:struct|enum|trait) ([A-Za-z_][A-Za-z0-9_]*)",
    ],
    "c": [_C_FUNC],
    "cpp": [r"(?m)^(?:class|struct) ([A-Za-z_][A-Za-z0-9_]*)", _CPP_FUNC],
}

#: file --declares--> package: the container a file announces itself
#: part of — go/java `package`, rust `mod` (a file-level module decl)
_PACKAGE_PATTERNS = {
    "go": [r"(?m)^package ([A-Za-z_][A-Za-z0-9_]*)"],
    "java": [r"(?m)^package ([A-Za-z_][A-Za-z0-9_.]*);"],
    "rust": [r"(?m)^(?:pub )?mod ([A-Za-z_][A-Za-z0-9_]*);"],
}

#: (predicate, per-language pattern table) — the single source of truth
#: for code_triples AND the queries.py oracle, which re-applies exactly
#: these patterns with Python `re`
EDGE_FAMILIES = (
    ("imports-module", _IMPORT_PATTERNS, "module"),
    ("defines-symbol", _DEFINE_PATTERNS, "symbol"),
    ("declares-package", _PACKAGE_PATTERNS, "package"),
)

#: language → comment/string-literal strip patterns, applied IN ORDER to
#: the content before extraction so a docstring or block comment holding
#: a line that starts with ``import``/``def`` cannot mint a false edge
#: (the ``^`` anchor alone only excludes indented and ``#``-prefixed
#: lines). Regex-level stripping, not a lexer: a quote character INSIDE
#: a string literal can still fool it (documented shape limit; the
#: triple-quote patterns are non-greedy so consecutive docstrings don't
#: merge). Same Java∩Python-re subset as the extraction patterns.
_C_STYLE_STRIP = [r"(?s)/\*.*?\*/", r"(?m)//.*$"]
_STRIP_PATTERNS = {
    "python": [
        '(?s)"""' + r".*?" + '"""',  # docstrings / triple-quoted strings
        r"(?s)'''.*?'''",
        r"(?m)#.*$",  # line comments
    ],
    "java": _C_STYLE_STRIP,
    "go": _C_STYLE_STRIP + [r"(?s)`[^`]*`"],  # + raw strings
    # template literals stripped like go raw strings; `//`-in-string (URLs)
    # is the documented shape limit
    "javascript": _C_STYLE_STRIP + [r"(?s)`[^`]*`"],
    "typescript": _C_STYLE_STRIP + [r"(?s)`[^`]*`"],
    # rust block comments nest: strip INNERMOST blocks (no `/*` inside)
    # twice, so one nesting level — the idiomatic case — strips fully
    # (`/* a /* b */ c */` → `/* a  c */` → ``); deeper nesting is the
    # remaining documented shape limit
    "rust": [r"(?s)/\*(?:(?!/\*).)*?\*/", r"(?s)/\*(?:(?!/\*).)*?\*/", r"(?m)//.*$"],
    "c": _C_STYLE_STRIP,
    "cpp": _C_STYLE_STRIP,
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
        def _one(p, src=stripped):
            if isinstance(p, tuple):  # (NESTED, outer, inner): block members
                _, outer, inner = p
                return F.flatten(
                    F.transform(
                        F.regexp_extract_all(src, F.lit(outer), F.lit(1)),
                        lambda b: F.regexp_extract_all(b, F.lit(inner), F.lit(1)),
                    )
                )
            return F.regexp_extract_all(src, F.lit(p), F.lit(1))

        arrs = [_one(p) for p in pats]
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


def declared_packages(files: DataFrame, content_col: str = "content") -> DataFrame:
    """(repo, path, lang, package) — the package/module a file declares
    itself part of: the 'file --declares--> package' edge family."""
    return _extract_exploded(files, _PACKAGE_PATTERNS, "package", content_col)


def code_triples(files: DataFrame, content_col: str = "content") -> DataFrame:
    """Name-level (subj, pred, obj) triples of the code KG — the same
    output surface as the linguistics pipeline's ``triples_view``, so a
    consumer reads both graphs identically. The subject is the
    repo-qualified file id ``repo/path`` — two repos holding the same
    path (every repo's src/main.go importing fmt) are distinct files and
    must stay distinct subjects. Deterministic ordering-free set; dedup
    is the distinct inside each family at (repo, path, obj) grain.
    One family per ``EDGE_FAMILIES`` entry — extending a language or a
    predicate is a pattern-table edit, never new plumbing."""
    subj = F.concat_ws("/", F.col("repo"), F.col("path")).alias("subj")
    out = None
    for pred, patterns, out_col in EDGE_FAMILIES:
        fam = _extract_exploded(files, patterns, out_col, content_col).select(
            subj, F.lit(pred).alias("pred"), F.col(out_col).alias("obj")
        )
        out = fam if out is None else out.unionByName(fam)
    return out


# ---------------------------------------------------------------------------
# deterministic synthetic source-repo table (tests / oracle gate)
# ---------------------------------------------------------------------------

def synthetic_source_files(n: int = 32) -> list:
    """Deterministic (repo, path, commit, lang, content) rows — the
    BASELINE.json input_hint shape — cycling all eight supported
    languages with known imports, definitions and package declarations.
    Pure Python so the DuckDB oracle can render the identical table as a
    VALUES CTE. Baked-in traps the gate must NOT extract, per language:
    comment/indented/docstring imports (python), block/line-comment
    imports (java, go, js/ts, rust, c, cpp), raw-string import (go),
    template-literal import + line-commented require (js/ts), grouped-
    import member behind a line comment (go); plus the SAME path in two
    repos (src/shared.py) so the gate fails if subjects ever conflate
    files across repos again."""
    rows = []
    langs = ["python", "java", "go", "javascript", "typescript", "rust", "c", "cpp"]
    for i in range(n):
        lang = langs[i % len(langs)]
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
                "/*\nimport block.comment.Trap;\nclass BlockTrap {}\n*/\n"
                "// import line.comment.Trap;\n"
                f"public class Main_{i} {{\n"
                f"    public int add_{i}(int a, int b) {{ return a + b; }}\n"
                f"    static List<String> names_{i}() {{ return null; }}\n"
                "    void run() {\n"
                "        obj.callTrap(arg);\n"  # call, ends ';' — no match
                "        Runnable r = new Runnable() {\n"  # anon class — no match
                "        };\n"
                f"        return new Builder_{i}() {{\n"  # return-new — no match
                "        };\n"
                "    }\n"
                "}\n"
                f"abstract class Base_{i} {{}}\ninterface Iface_{i} {{}}\n"
            )
        elif lang == "go":
            path = f"src/main_{i}.go"
            content = (
                f'package main\nimport "fmt"\nimport "example.com/dep_{i % 5}"\n'
                f'import (\n\t"os"\n\t"lib/grouped_{i % 3}"\n\t// "lib/grouped_trap"\n)\n'
                "/*\nimport \"block/comment/trap\"\nfunc blockTrap() {}\n*/\n"
                'var doc = `raw string\nimport "raw/string/trap"\n`\n'
                f"func main_{i}() {{}}\n"
                f"func (s *Srv) Method_{i}() {{}}\ntype Cfg_{i} struct {{}}\n"
            )
        elif lang in ("javascript", "typescript"):
            ext = "js" if lang == "javascript" else "ts"
            iface = f"export interface Props_{i} {{}}\n" if ext == "ts" else ""
            content = (
                f"import React from 'react'\n"
                f"import {{ helper }} from \"./util_{i % 5}\"\n"
                f"import './styles_{i % 3}.css'\n"
                f"const dep = require('lodash_{i % 2}')\n"
                "// import trap from 'line-comment-trap'\n"
                "/* import 'block-comment-trap' */\n"
                "// const t = require('require-trap')\n"
                "const tpl = `\nimport 'template-literal-trap'\n`\n"
                f"export default function Component_{i}() {{}}\n"
                f"class Widget_{i} {{}}\n"
                f"export const fmt_{i} = (x) => String(x)\n"
                f"const pick_{i} = async item => item.id\n"
                f"const plain_{i} = 42\n"  # no arrow — must NOT extract
                + iface
                + (
                    f"let on_{i}: Handler = (e) => e\n"
                    f"export type Mode_{i} = 'a' | 'b'\n"
                    if ext == "ts"
                    else ""
                )
            )
            path = f"src/comp_{i}.{ext}"
        elif lang == "rust":
            path = f"src/lib_{i}.rs"
            content = (
                f"use std::collections::HashMap;\nuse crate_{i % 5}::prelude;\n"
                "use std::{io, fmt};\n"
                f"extern crate serde_{i % 2};\n"
                f"mod submod_{i};\n"
                "// use commented::line_trap;\n"
                "/*\nuse commented::block_trap;\nfn block_trap() {}\n*/\n"
                "/* outer /* nested */ use nested::comment_trap;\nfn tail_trap() {} */\n"
                f"pub fn run_{i}() {{}}\nfn helper_{i}() {{}}\n"
                f"pub struct State_{i};\nenum Mode_{i} {{}}\ntrait Act_{i} {{}}\n"
            )
        elif lang == "c":
            path = f"src/core_{i}.c"
            content = (
                f"#include <stdio.h>\n#include \"core_{i % 5}.h\"\n"
                "# include <spaced.h>\n"
                "/*\n#include <block_trap.h>\nint comment_fn_trap(void);\n*/\n"
                "// #include <line_trap.h>\n"
                f"int main_{i}(void) {{ return 0; }}\n"
                f"static unsigned long *helper_{i}(int n) {{ return 0; }}\n"
                f"int proto_{i}(int);\n"  # prototype: declaration-level extract
                f"typedef int (*cb_{i})(void);\n"  # fn-pointer typedef — no match
                "int width = 640;\n"  # initializer — no match
            )
        else:  # cpp
            path = f"src/engine_{i}.cpp"
            content = (
                f"#include <vector>\n#include \"engine_{i % 5}.hpp\"\n"
                "/*\n#include <block_trap.hpp>\nclass BlockTrap;\n*/\n"
                "// #include <line_trap.hpp>\n"
                f"class Engine_{i} {{}};\nstruct Opts_{i} {{}};\n"
                f"void render_{i}(int frame) {{}}\n"
                f"virtual const char *name_{i}() const;\n"
                f"int Engine_{i}::run(int ticks) {{ return ticks; }}\n"
                f"typedef void (*hook_{i})(int);\n"  # fn-pointer typedef — no match
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


def synthetic_source_table(spark, n_files: int):
    """Scaled synthetic source-repo table, generated ENTIRELY JVM-side
    (``spark.range`` + ``format_string`` — no driver-side row list, no
    Python), so the generator itself is valid at any file count: the
    bench harness uses it to measure code-KG extraction throughput on
    the north-rule input shape. Each file is a deterministic function of
    its id, cycles the three heaviest-grammar languages, and carries the
    same comment/raw-string trap surface as ``synthetic_source_files``
    so the measured work includes the strip passes."""
    from pyspark.sql import functions as F

    base = spark.range(n_files).select(
        F.concat(F.lit("repo"), (F.col("id") % 1024).cast("string")).alias("repo"),
        F.col("id"),
        (F.col("id") % 3).alias("lang_ix"),
    )
    py = F.format_string(
        "import os\nimport util_%d\nfrom pkg_%d.sub import thing\n"
        "# import commented_out\n  import indented_ignored\n"
        '"""docstring\nimport docstring_trap\n"""\n'
        "def fn_%d(x):\n    return x\nclass Cls_%d:\n    pass\n",
        F.col("id") % 97, F.col("id") % 31, F.col("id"), F.col("id"),
    )
    java = F.format_string(
        "package app.p%d;\nimport java.util.List;\nimport org.lib_%d.Util;\n"
        "/*\nimport block.comment.Trap;\n*/\n// import line.comment.Trap;\n"
        "public class Main_%d {}\ninterface Iface_%d {}\n",
        F.col("id") % 31, F.col("id") % 97, F.col("id"), F.col("id"),
    )
    go = F.format_string(
        'package main\nimport "fmt"\nimport (\n\t"os"\n\t"lib/dep_%d"\n)\n'
        '/*\nimport "block/trap"\n*/\nvar doc = `\nimport "raw/trap"\n`\n'
        "func main_%d() {}\ntype Cfg_%d struct {}\n",
        F.col("id") % 97, F.col("id"), F.col("id"),
    )
    ix = F.col("lang_ix")

    def _pick(a, b, c):
        # CASE WHEN short-circuits per row in codegen — only the selected
        # language's content expression evaluates
        return F.when(ix == 0, a).when(ix == 1, b).otherwise(c)

    return base.select(
        "repo",
        F.concat(
            F.lit("src/f_"), F.col("id").cast("string"),
            _pick(F.lit(".py"), F.lit(".java"), F.lit(".go")),
        ).alias("path"),
        F.format_string("c%08d", F.col("id")).alias("commit"),
        _pick(F.lit("python"), F.lit("java"), F.lit("go")).alias("lang"),
        _pick(py, java, go).alias("content"),
    )
