#!/usr/bin/env python
"""Vendor the PaddleSpeech traditional->simplified character table.

Reads the two aligned character strings out of the reference's
chinese_norm/char_convert.py (public PaddleSpeech data, Apache-2.0) and
writes a {traditional: simplified} JSON map for runtime use:

    python tools/build_trad2simp.py \
        > easevoice_trainer_tpu/text/data/trad2simp.json
"""
import ast
import json
import sys

SRC = "/root/reference/src/easevoice/text/chinese_norm/char_convert.py"


def main():
    tree = ast.parse(open(SRC, encoding="utf8").read())
    strings = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and isinstance(node.value,
                                                       ast.Constant):
            for t in node.targets:
                if getattr(t, "id", "") in ("simplified_charcters",
                                            "traditional_characters"):
                    strings[t.id] = node.value.value
    simp = strings["simplified_charcters"]
    trad = strings["traditional_characters"]
    assert len(simp) == len(trad), (len(simp), len(trad))
    mapping = {t: s for t, s in zip(trad, simp) if t != s}
    json.dump(mapping, sys.stdout, ensure_ascii=False, separators=(",", ":"))


if __name__ == "__main__":
    main()
