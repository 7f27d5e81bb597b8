#!/usr/bin/env python3
"""Reproducible leak scan (dev tooling): greps the shipped sources for
indicators that anything non-public leaked into the build — proprietary
package roots, internal-looking URLs/buckets, credential-shaped strings,
environment variables outside the declared SPARK_GRAFT_* surface, and
non-public dependency coordinates.

Usage: python3 tools/leakcheck.py [repo_root] [round]
Prints one JSON object: {"round": N|null, "generated_by": ...,
"generated_at": ..., "files_scanned": N, "n_hits": N,
"hits": {category: [file:line, ...]}} — n_hits 0 means clean. Redirect to
LEAKCHECK.json to refresh the committed artifact reproducibly.
"""
import json
import os
import re
import sys

CATEGORIES = {
    # non-public package/import roots (the build only uses org.apache.spark,
    # scala, java, graft, org.scalatest/scalacheck)
    "nonpublic_imports": re.compile(
        r"^\s*import\s+(?!org\.apache\.|scala\b|scala\.|java\.|javax\.|"
        r"graft\.|org\.scalatest|org\.scalacheck|org\.slf4j|"
        r"[a-z]\w*\.implicits\._)"),  # session `import spark.implicits._`
    # URLs other than public docs/spec references
    "urls": re.compile(
        r"https?://(?!www\.apache\.org|spark\.apache\.org|github\.com|"
        r"arxiv\.org|doi\.org|example\.com|localhost|127\.0\.0\.1)\S+"),
    # cloud bucket / private-network host shapes
    "buckets_hosts": re.compile(
        r"s3://|gs://|abfss?://|vpc-|\b10\.\d+\.\d+\.\d+\b"),
    # credential-shaped strings
    "secrets": re.compile(
        r"(?i)(api[_-]?key|secret|password|token)\s*[:=]\s*[\"'][^\"']{8,}"),
    # env vars beyond the declared surface (SPARK_GRAFT_* plus standard
    # SPARK_* runtime knobs)
    "env_vars": re.compile(
        r"sys\.env[^\n]*?\"(?!SPARK_)[A-Z][A-Z0-9_]*\""),
    # dependency coordinates beyond the declared test libs (the build may
    # only resolve scalatest/scalacheck; Spark comes from unmanaged jars).
    # Matches the coordinate LINE ("group" %% "artifact"), not the
    # libraryDependencies keyword — the Seq(...) form puts them on later
    # lines
    # artifact must start with a letter — "x.y.z" version strings after the
    # second % would otherwise self-flag the allowed coordinates
    "dependencies": re.compile(
        r"\"[\w.-]+\"\s*%%?\s*\"(?!scalatest|scalacheck|\d)[A-Za-z]"),
    # JDBC endpoints that aren't the in-memory/test Derby/H2 forms
    "jdbc": re.compile(
        r"jdbc:(?!derby:memory|h2:mem|derby:;)"),
}

SCAN_DIRS = ["src", "tools"]
SCAN_EXT = {".scala", ".py", ".sbt", ".md"}


def scan_file(root, p, hits, scala):
    for i, line in enumerate(open(p, errors="replace"), 1):
        for cat, rx in CATEGORIES.items():
            # the import-root allowlist is a JVM-source rule; python
            # tooling imports (duckdb, pandas) are driver-declared deps
            if cat == "nonpublic_imports" and not scala:
                continue
            if rx.search(line):
                hits[cat].append(f"{os.path.relpath(p, root)}:{i}")


def main(root: str, round_no=None) -> int:
    hits = {k: [] for k in CATEGORIES}
    n_files = 0
    # the build file lives at the root, outside SCAN_DIRS — without this the
    # 'dependencies' category could never fire on the one file it exists for
    for f in ("build.sbt",):
        p = os.path.join(root, f)
        if os.path.exists(p):
            n_files += 1
            scan_file(root, p, hits, scala=True)
    for d in SCAN_DIRS:
        for dirpath, _, files in os.walk(os.path.join(root, d)):
            for f in sorted(files):
                if os.path.splitext(f)[1] not in SCAN_EXT:
                    continue
                if f == "leakcheck.py":  # the patterns match themselves
                    continue
                p = os.path.join(dirpath, f)
                n_files += 1
                scan_file(root, p, hits,
                          scala=os.path.splitext(f)[1] in (".scala", ".sbt"))
    import datetime
    out = {
        "round": int(round_no) if round_no is not None else None,
        "generated_by": "python3 tools/leakcheck.py <repo_root> [round]",
        "generated_at": datetime.datetime.now(datetime.timezone.utc)
            .strftime("%Y-%m-%dT%H:%MZ"),
        "files_scanned": n_files,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    print(json.dumps(out, indent=2))
    return 1 if any(hits.values()) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else ".",
                  sys.argv[2] if len(sys.argv) > 2 else None))
