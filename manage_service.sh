#!/usr/bin/env bash
# Service management helper (reference: manage_service.sh — start/stop/
# update/logs/status/clean around docker compose).
set -euo pipefail

cmd=${1:-help}

case "$cmd" in
  start)
    docker compose up -d --build
    echo "started — http://localhost:${PORT:-5000}"
    ;;
  stop)
    docker compose down
    ;;
  restart)
    docker compose restart audio-processor-tpu
    ;;
  update)
    git pull --ff-only
    docker compose up -d --build
    ;;
  logs)
    docker compose logs -f --tail=200 audio-processor-tpu
    ;;
  status)
    docker compose ps
    curl -fsS "http://localhost:${PORT:-5000}/api/health" | python3 -m json.tool || true
    ;;
  clean)
    docker compose down -v
    docker image prune -f
    ;;
  test)
    python -m pytest tests/ -q
    ;;
  bench)
    python bench.py "${@:2}"
    ;;
  *)
    echo "usage: $0 {start|stop|restart|update|logs|status|clean|test|bench}"
    exit 1
    ;;
esac
