#!/bin/sh
# Full test suite (fast tier + slow model/trainer tests).
# The default `pytest` run excludes the slow tier (pyproject addopts);
# CI-style full validation runs both tiers separately so a slow-tier
# timeout cannot mask fast-tier failures.
set -e
cd "$(dirname "$0")/.."
echo "== fast tier =="
python -m pytest tests/ -q
echo "== slow tier =="
python -m pytest tests/ -q -m slow -o addopts=""
