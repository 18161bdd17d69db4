#!/usr/bin/env bash
# Run a graft main class against a CLASSES SNAPSHOT with an explicit
# binary identity (r16 verdict item 3): Provenance.gitSha resolves the
# CWD's git tree, which is the wrong identity for snapshot-binary runs —
# an A/B leg or a soak/chaos re-stamp running /tmp-copied classes of a
# known commit used to stamp its artifact `-dirty`/`unknown`. This
# wrapper pins the identity the artifact should carry:
#
#   tools/snapshot_run.sh <classes-dir> <sha|HEAD> <MainClass> [args...]
#
# - exports SPARK_GRAFT_BINARY_SHA=<sha> (recorded by Provenance.stamp
#   as "binary_sha" next to the tree-resolved "git_sha")
# - refuses a sha that does not resolve in this repo (typo guard)
# - launches via spark_java.sh (module opens) with the snapshot FIRST on
#   the classpath
#
# JVM options (e.g. -Xmx96g) and -D flags go via SNAPSHOT_JAVA_OPTS.
set -euo pipefail
HERE="$(cd "$(dirname "$0")" && pwd)"
CLASSES="$1"; SHA_IN="$2"; shift 2

[ -d "$CLASSES" ] || { echo "no such classes dir: $CLASSES" >&2; exit 2; }
SHA="$(git -C "$HERE/.." rev-parse --verify "${SHA_IN}^{commit}")" \
  || { echo "sha '$SHA_IN' does not resolve in the repo" >&2; exit 2; }

export SPARK_GRAFT_BINARY_SHA="$SHA"
# shellcheck disable=SC2086
exec "$HERE/spark_java.sh" ${SNAPSHOT_JAVA_OPTS:-} \
  -cp "$CLASSES:/opt/spark/jars/*" "$@"
