#!/bin/bash
# Reinstall the compile-before-commit guard (git hooks are not versioned
# and do not survive environment resets). Run once per fresh checkout.
set -e
cd "$(dirname "$0")/.."
hooks_dir=$(git rev-parse --git-path hooks)
mkdir -p "$hooks_dir"
cat > "$hooks_dir/pre-commit" <<'EOF'
#!/bin/bash
# Guard: any commit touching src/ must pass Test/compile first.
# Escape hatch for doc-only emergencies: GRAFT_SKIP_COMPILE_HOOK=1
[ "$GRAFT_SKIP_COMPILE_HOOK" = "1" ] && exit 0
if git diff --cached --name-only | grep -q '^src/'; then
  # the compile below checks the WORKING TREE; it only proves the staged
  # snapshot if they agree — refuse unstaged src/ edits rather than pass
  # a broken staged state (or refuse a good one) on the wrong tree
  if ! git diff --quiet -- src/; then
    echo "[pre-commit] unstaged src/ changes differ from the staged snapshot —" >&2
    echo "             stage or stash them so the compile checks what will be committed" >&2
    exit 1
  fi
  log=$(mktemp /tmp/precommit_compile.XXXXXX.log)
  echo "[pre-commit] staged src/ changes — running sbt Test/compile" >&2
  if ! sbt -batch Test/compile >"$log" 2>&1; then
    echo "[pre-commit] Test/compile FAILED — commit refused (log: $log)" >&2
    tail -20 "$log" >&2
    exit 1
  fi
  rm -f "$log"
fi
exit 0
EOF
chmod +x "$hooks_dir/pre-commit"
echo "pre-commit hook installed at $hooks_dir/pre-commit"
