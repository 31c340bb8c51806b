#!/bin/bash
# Reinstall the compile-before-commit guard (git hooks are not versioned
# and do not survive environment resets). Run once per fresh checkout.
cd "$(dirname "$0")/.."
cat > .git/hooks/pre-commit <<'EOF'
#!/bin/bash
# Guard: any commit touching src/ must pass Test/compile first.
# Escape hatch for doc-only emergencies: GRAFT_SKIP_COMPILE_HOOK=1
[ "$GRAFT_SKIP_COMPILE_HOOK" = "1" ] && exit 0
if git diff --cached --name-only | grep -q "^src/"; then
  echo "[pre-commit] staged src/ changes — running sbt Test/compile" >&2
  sbt -batch Test/compile >/tmp/precommit_compile.log 2>&1
  rc=$?
  if [ $rc -ne 0 ]; then
    echo "[pre-commit] Test/compile FAILED — commit refused (log: /tmp/precommit_compile.log)" >&2
    tail -20 /tmp/precommit_compile.log >&2
    exit 1
  fi
fi
exit 0
EOF
chmod +x .git/hooks/pre-commit
echo "pre-commit hook installed"
