#!/bin/bash
# Refresh the run snapshot: long TPU runs import the package from
# .runsnap/ (PYTHONPATH=.runsnap:...) so repo edits never race an
# in-flight run's lazy imports (CLAUDE.md gotcha).
cd "$(dirname "$0")/.."
rm -rf .runsnap
mkdir -p .runsnap
cp -a hybridneuralrendering_tpu .runsnap/
find .runsnap -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null
echo "snapshot refreshed: $(find .runsnap -name '*.py' | wc -l) files"
