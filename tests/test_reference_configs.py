"""Every reference config parses (mjson-tolerant) and builds.

The reference's hand-rolled JSON parser accepts trailing commas
(src/phyc/mjson.c:633) and its own fixtures use them (tests/data/f81.json);
the physher-tpu front end must therefore accept every config the reference
ships, unmodified (src/physher.c:128-205 build flow).
"""

import glob
import os

import pytest

REF = "/root/reference"
CONFIGS = sorted(
    glob.glob(os.path.join(REF, "tests/data/*.json"))
    + glob.glob(os.path.join(REF, "examples/fluA/*.json"))
) if os.path.isdir(REF) else []


@pytest.mark.skipif(not CONFIGS, reason="reference tree not available")
@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_reference_config_builds(path):
    from physher_tpu.config.builder import load_json, build_config

    cfg = load_json(path)
    ctx, actions = build_config(cfg, base_dir=os.path.dirname(path))
    assert ctx.objects, f"{path} built no objects"


def test_tolerant_json_trailing_commas():
    from physher_tpu.config.builder import loads_tolerant

    assert loads_tolerant('{"a": [1, 2,], "b": {"c": 1,},}') == \
        {"a": [1, 2], "b": {"c": 1}}
    # commas/brackets inside strings survive; blanks are not whitespace
    assert loads_tolerant('{"a": "x,]", "b": [1,\n "s",\n]}') == \
        {"a": "x,]", "b": [1, "s"]}
