"""Deterministic synthetic source-code repository table.

This is the engine's input fixture per BASELINE.json ``input_hint``:
``repos(repo:string, path:string, commit:string, lang:string, content:string)``.
The file contents embed planted ``import`` / ``#include`` lines that encode a
KNOWN edge list, so the parsed link graph is exact — the analog of the
reference's seeded RandomGraphGenerator fixtures
(core/src/main/java/org/neo4j/gds/beta/generator/RandomGraphGenerator.java:63).

Determinism: content is a pure function of (file index, neighbor list, seed);
no RNG at generation time beyond the seeded edge list. The per-row invariant
is ``sha2(content, 256)`` equality against the values recorded at generation
(``content_sha256`` companion column), checked by :func:`verify_content_sha`.

Everything runs distributed: the edge list is a DataFrame, neighbor lists are
a ``groupBy(src).collect_list`` and content synthesis is an Arrow-batched
``mapInPandas`` — no driver-side materialization, so the same code generates
a 10^12-file table on a cluster.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

LANGS = ("py", "c", "java")
_EXT = {"py": "py", "c": "c", "java": "java"}

REPO_SCHEMA = "repo string, path string, commit string, lang string, content string"


def file_lang(i: int) -> str:
    return LANGS[i % 3]


def file_repo(i: int, files_per_repo: int = 16) -> str:
    return f"org/repo{i // files_per_repo}"


def file_path(i: int) -> str:
    return f"src/m{i}.{_EXT[file_lang(i)]}"


def file_key(i: int, files_per_repo: int = 16) -> str:
    """Stable original-node key: repo::path."""
    return f"{file_repo(i, files_per_repo)}::{file_path(i)}"


def _import_line(lang: str, j: int) -> str:
    if lang == "py":
        return f"import m{j}"
    if lang == "c":
        return f'#include "m{j}.h"'
    return f"import org.example.m{j};"


def _body(lang: str, i: int) -> str:
    # deterministic filler so contents differ per file (sha256 invariant is
    # meaningful) and look vaguely like code of the right language
    h = hashlib.sha256(f"body-{i}".encode()).hexdigest()[:12]
    if lang == "py":
        return f"\n\ndef f_{i}():\n    return '{h}'\n"
    if lang == "c":
        return f"\n\nconst char *f_{i}(void) {{ return \"{h}\"; }}\n"
    return f"\n\nclass M{i} {{ String f() {{ return \"{h}\"; }} }}\n"


def synthesize_repo_table(
    spark: SparkSession,
    edges: DataFrame,
    n_files: int,
    files_per_repo: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Build the source table from a known ``(src long, dst long)`` edge list.

    File ``i`` declares module ``m{i}``; an edge (i, j) is planted as an
    import of module ``m{j}`` using language-appropriate syntax. Returns
    columns ``repo path commit lang content content_sha256`` — drop the last
    column to get the pure input table.
    """
    files = spark.range(n_files).select(F.col("id").alias("src"))
    neigh = (
        files.join(edges.groupBy("src").agg(F.sort_array(F.collect_list("dst")).alias("dsts")),
                   "src", "left")
        .select("src", F.coalesce("dsts", F.array().cast("array<long>")).alias("dsts"))
    )
    fpr = files_per_repo

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, dsts in zip(pdf["src"], pdf["dsts"]):
                i = int(i)
                lang = file_lang(i)
                imports = "\n".join(_import_line(lang, int(j)) for j in dsts)
                header = f"// module m{i} seed={seed}\n" if lang != "py" else f"# module m{i} seed={seed}\n"
                content = header + imports + _body(lang, i)
                commit = hashlib.sha256(f"commit-{file_repo(i, fpr)}-{seed}".encode()).hexdigest()
                rows.append((
                    file_repo(i, fpr), file_path(i), commit, lang, content,
                    hashlib.sha256(content.encode()).hexdigest(),
                ))
            yield pd.DataFrame(rows, columns=["repo", "path", "commit", "lang",
                                              "content", "content_sha256"])

    return neigh.mapInPandas(gen, schema=REPO_SCHEMA + ", content_sha256 string")


def verify_content_sha(repos: DataFrame, recorded: DataFrame) -> int:
    """Per-row invariant: sha2(content,256) equality vs the recorded table.

    Returns the number of violating rows (0 = pass). ``recorded`` carries
    ``(repo, path, commit, content_sha256)``.
    """
    actual = repos.select(
        "repo", "path", "commit", F.sha2(F.col("content"), 256).alias("actual_sha")
    )
    joined = actual.join(recorded.select("repo", "path", "commit", "content_sha256"),
                         ["repo", "path", "commit"], "full_outer")
    return joined.where(
        F.col("actual_sha").isNull()
        | F.col("content_sha256").isNull()
        | (F.col("actual_sha") != F.col("content_sha256"))
    ).count()
