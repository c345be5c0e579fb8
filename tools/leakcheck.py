#!/usr/bin/env python3
"""Repo-side hygiene scan: verify no private/internal references leaked into
the source tree, and emit a PROVENANCED artifact (timestamp + HEAD commit +
tool version) so a given round's run is distinguishable from a hand-edited
counter bump (ADVICE r6 #3).

Categories mirror the public-information policy: external URLs off the
allowlist, cloud bucket URIs, chat-archive links, credential-shaped strings,
non-public package imports, and suspicious environment variables. All
patterns are generic; the scan knows nothing secret.

Usage: tools/leakcheck.py [round_no]  -> writes LEAKCHECK.json
"""
import json, re, subprocess, sys, datetime, pathlib

TOOL_VERSION = "1.0"

ALLOWED_URL_HOSTS = (
    "apache.org", "scala-lang.org", "scalatest.org", "github.com",
    "duckdb.org", "opentelemetry.io", "w3.org", "example.com", "localhost",
    "127.0.0.1", "0.0.0.0",
)

# Public top-level packages an import line may reference (plus local vals
# like `spark.implicits._` / `s.implicits._`, which are session members,
# not packages).
ALLOWED_IMPORT_ROOTS = (
    "org.apache", "org.scala", "scala.", "java.", "javax.", "graft.",
    "org.scalatest", "org.scalacheck", "io.jsonwebtoken", "com.sun",
    "com.fasterxml", "spark.", "s.implicits",
)

CATEGORIES = {
    # import/package lines referencing anything outside the public stacks
    "internal-import": re.compile(r'^\s*import\s+([A-Za-z_][\w.]+)', re.M),
    "internal-url": re.compile(r'https?://[^\s"\')]+'),
    "cloud-bucket": re.compile(r'\b(?:s3|gs|s3a|abfss?|wasbs?)://[\w][^\s"\')]*'),
    "chat-link": re.compile(r'slack\.com/archives|app\.slack\.com'),
    "api-key": re.compile(r'\b(?:AKIA[0-9A-Z]{16}|sk-[A-Za-z0-9]{20,}|ghp_[A-Za-z0-9]{20,})\b'),
    "suspicious-env": re.compile(r'\b(?:AWS_SECRET|GCP_SA|INTERNAL_[A-Z_]+)\b'),
}

def scan():
    hits = {k: [] for k in CATEGORIES}
    root = pathlib.Path(".")
    files = [p for pat in ("src/**/*.scala", "tools/**/*.py", "tools/**/*.sh", "*.md", "*.sbt")
             for p in root.glob(pat)]
    for p in files:
        try:
            text = p.read_text(errors="replace")
        except OSError:
            continue
        for cat, rx in CATEGORIES.items():
            for m in rx.finditer(text):
                s = m.group(0)
                if cat == "internal-import":
                    if p.suffix not in (".scala", ".sbt"):
                        continue  # the JVM-namespace check only means something in Scala
                    target = m.group(1)
                    if any(target.startswith(r) for r in ALLOWED_IMPORT_ROOTS):
                        continue
                    # local-scope imports: a capitalized first segment is an
                    # object in this codebase, and `<val>.implicits` /
                    # `<val>.sparkSession.implicits` are session members
                    if target[0].isupper() or ".implicits" in target:
                        continue
                if cat == "internal-url":
                    if any(h in s for h in ALLOWED_URL_HOSTS):
                        continue
                    # single-label hosts (http://x, https://evil) are
                    # adversarial test fixtures, not real endpoints
                    host = re.sub(r'^https?://', '', s).split('/')[0].split(':')[0]
                    if '.' not in host:
                        continue
                if cat == "cloud-bucket" and re.match(r'^\w+://(bucket|path)\b', s):
                    continue  # documented placeholder in guard tests / docs
                if str(p) == "tools/leakcheck.py":
                    continue  # the pattern list itself
                line = text.count("\n", 0, m.start()) + 1
                hits[cat].append(f"{p}:{line}: {s[:80]}")
    return hits

def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else None
    hits = scan()
    head = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                          text=True).stdout.strip()
    out = {
        "round": rnd,
        "measured_at": datetime.datetime.now(datetime.timezone.utc)
            .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "head_commit": head,
        "tool_version": TOOL_VERSION,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    pathlib.Path("LEAKCHECK.json").write_text(json.dumps(out, indent=2) + "\n")
    print(f"leakcheck: {out['n_hits']} hits @ {head[:9]}")

if __name__ == "__main__":
    main()
