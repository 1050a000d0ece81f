#!/usr/bin/env python3
"""Repo-side leak scan with provenance.

Scans the build sources (src/, tools/, build.sbt) for anything that
should never appear in a public, self-contained Spark library:
imports outside the public dependency set, non-localhost URLs, cloud
bucket URIs, chat/ticket short links, credential-shaped strings, and
unexpected environment-variable reads.

Unlike the driver's scan, the output embeds the commit sha, dirty
flag, timestamp, and file/pattern counts — so a zero-hit artifact is
evidence the scan ran against THIS tree, not an empty run.

Usage: python3 tools/leakcheck.py [> LEAKCHECK_LOCAL.json]
"""
import json
import re
import subprocess
import sys
from datetime import datetime, timezone
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

# Public-only import allowlist for Scala sources.
ALLOWED_IMPORT_ROOTS = (
    "org.apache.spark", "org.apache.hadoop", "org.apache.parquet",
    "org.apache.arrow", "org.apache.log4j", "org.slf4j",
    "scala", "java", "javax", "graft",
    "org.scalatest", "org.scalacheck", "com.fasterxml.jackson",
    # avro-core ships in the Spark distribution's jars (IcebergLite's
    # driver-side manifest read/write) — no added dependency
    "org.apache.avro",
    # the JDK's built-in HTTP server (module jdk.httpserver, standard
    # since Java 6) — the in-process REST-catalog stub (r18)
    "com.sun.net.httpserver",
)

# Env vars the code may legitimately read (documented in SURVEY/README).
ALLOWED_ENV = {"SPARK_GRAFT_SF_DIR", "SPARK_GRAFT_CPUS", "SPARK_GRAFT_OUT",
               "SPARK_GRAFT_SCALE_DIR", "SPARK_GRAFT_SCALE_COPIES",
               "SPARK_GRAFT_SCALE_SKIP", "SPARK_GRAFT_SCALE_ONLY",
               "SPARK_GRAFT_SCALE_FAST", "SPARK_GRAFT_WRITE_LOCAL",
               "SPARK_MASTER", "SPARK_DRIVER_MEM",
               "JAVA_HOME", "SPARK_HOME", "HOME", "PATH", "TMPDIR"}

# Local imports (`import spark.implicits._`, `import MinHashSig.P`) have
# no external root; only fully-qualified external packages are in scope.
EXTERNAL_ROOTS = ("com.", "org.", "net.", "io.", "ai.", "dev.",
                  "software.", "co.", "ml.", "edu.")

def _allowed_import(pkg):
    # package-boundary match: "org.apache.sparkproject.shaded" must NOT
    # pass on the "org.apache.spark" allowlist entry
    return any(pkg == root or pkg.startswith(root + ".")
               for root in ALLOWED_IMPORT_ROOTS)


CHECKS = {
    "scala-import": (
        re.compile(r"^\s*import\s+([A-Za-z_][\w.]*)", re.M),
        lambda m: m.group(1).startswith(EXTERNAL_ROOTS)
        and not _allowed_import(m.group(1)),
    ),
    # URL fixtures are confined to the RFC 2606/6761 reserved namespaces
    # (.test/.example/.invalid/.localhost TLDs and example.com/org/net) —
    # names that by IANA contract can never identify a real system, i.e.
    # the designated fixture namespace. Dotless "hosts" are concat
    # prefixes of planted fixture URLs ('https://sub' + id + '.test');
    # a dotless name resolves nowhere public and names nothing.
    # Anything else is a hit.
    "url": (
        re.compile(r"https?://([\w.-]+)"),
        lambda m: m.group(1).lower() not in {"localhost", "127.0.0.1"}
        and "." in m.group(1)
        and not m.group(1).lower().rstrip(".").endswith(
            (".test", ".example", ".invalid", ".localhost",
             "example.com", "example.org", "example.net")),
    ),
    "bucket-uri": (re.compile(r"\b(?:s3a?|gs|wasbs?|abfss?)://[\w./-]+"),
                   lambda m: True),
    "chat-or-shortlink": (
        re.compile(r"\b(?:slack\.com/|go/[a-z][\w-]{2,})", re.I),
        lambda m: True),
    "credential-shape": (
        # AWS-style access keys, PEM headers, long generic secrets
        re.compile(r"\b(?:AKIA[0-9A-Z]{16}|-----BEGIN [A-Z ]*PRIVATE KEY-----"
                   r"|(?:api|secret)[_-]?key\s*[:=]\s*['\"][\w/+=-]{16,})", re.I),
        lambda m: True),
    "env-read": (
        re.compile(r'(?:sys\.env(?:\.get(?:OrElse)?)?\s*\(\s*|System\.getenv\s*\(\s*)"([A-Z0-9_]+)"'),
        lambda m: m.group(1) not in ALLOWED_ENV,
    ),
}


def files():
    for pat in ("src/**/*.scala", "tools/*.py", "tools/*.sh", "build.sbt"):
        yield from sorted(ROOT.glob(pat))


def git(*args):
    return subprocess.run(["git", "-C", str(ROOT), *args],
                          capture_output=True, text=True).stdout.strip()


def main():
    hits = {name: [] for name in CHECKS}
    n_files = 0
    for path in files():
        n_files += 1
        text = path.read_text(errors="replace")
        for name, (rx, is_hit) in CHECKS.items():
            for m in rx.finditer(text):
                if is_hit(m):
                    line = text[: m.start()].count("\n") + 1
                    hits[name].append(
                        f"{path.relative_to(ROOT)}:{line}: {m.group(0)[:120]}")
    # The artifact itself can't be committed before it exists — it never
    # counts toward dirtiness of the tree it describes.
    porcelain = [l for l in git("status", "--porcelain").splitlines()
                 if not l.endswith("LEAKCHECK_LOCAL.json")]
    out = {
        "commit": git("rev-parse", "HEAD"),
        "dirty": bool(porcelain),
        "scanned_at": datetime.now(timezone.utc).isoformat(timespec="seconds"),
        "n_files": n_files,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    json.dump(out, sys.stdout, indent=1)
    print()
    return 1 if out["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main())
