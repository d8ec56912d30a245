#!/usr/bin/env bash
# Minimal kaldi-style option parser: --name value overrides variable $name.
while true; do
  case "$1" in
    --*) name=$(echo "$1" | sed s/^--// | sed s/-/_/g)
         eval "[ -n \"\${$name+x}\" ]" || { echo "unknown option $1"; exit 1; }
         eval "$name=\"$2\""; shift 2 ;;
    *) break ;;
  esac
done
