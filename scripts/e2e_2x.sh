#!/usr/bin/env bash
# Thin wrapper kept for the BASELINE.md rows that cite it — the harness is
# factor-parametrized now (VERDICT r4 #4): scripts/e2e_ladder.sh <wd> 2 ...
exec "$(dirname "$0")/e2e_ladder.sh" "${1:?usage: e2e_2x.sh <workdir> [epochs] [projs]}" 2 "${2:-4}" "${3:-16}"
