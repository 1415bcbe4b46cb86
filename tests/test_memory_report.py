"""Unit tests for the HLO liveness parser in scripts/memory_report.py.

The parser is pure text analysis (no device), so it is fully testable
off-TPU with a synthetic scheduled-HLO module.
"""

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))

from memory_report import _shape_bytes, liveness_report  # noqa: E402


def test_shape_bytes():
    assert _shape_bytes("f32[4,1000,8,32]{3,2,1,0}") == 4 * 1000 * 8 * 32 * 4
    assert _shape_bytes("bf16[2,8]") == 2 * 8 * 2
    # tuple shapes sum their leaves
    assert _shape_bytes("(f32[8], s32[8])") == 8 * 4 + 8 * 4
    # scalars: empty dims -> one element
    assert _shape_bytes("pred[]") == 1
    assert _shape_bytes("no shapes here") == 0


_SYNTHETIC_HLO = """\
HloModule jit_run, is_scheduled=true

ENTRY %main (p0: f32[1024]) -> f32[1024] {
  %p0 = f32[1024]{0} parameter(0)
  %big = f32[262144]{0} broadcast(%p0), dimensions={0}
  %a = f32[1024]{0} slice(%big), slice={[0:1024]}
  %b = f32[1024]{0} add(%a, %p0)
  %small = f32[8]{0} slice(%b), slice={[0:8]}
  %c = f32[1024]{0} multiply(%b, %b)
  ROOT %out = f32[1024]{0} add(%c, %a)
}
"""


def test_liveness_peak_and_residents():
    peak, peak_idx, residents = liveness_report(_SYNTHETIC_HLO, top=10)
    # %big (1 MB) is live from its def until its last use (%a's def);
    # the peak must include it and be at least its size
    assert peak >= 262144 * 4
    names = [nm for _, nm, _ in residents]
    assert "%big" in names
    # residents are sorted largest-first
    sizes = [s for s, _, _ in residents]
    assert sizes == sorted(sizes, reverse=True)


def test_liveness_requires_entry():
    with pytest.raises(ValueError, match="ENTRY"):
        liveness_report("HloModule empty\n")


def test_liveness_bare_name_hlo():
    """HloPrintOptions without '%' prefixes must parse equivalently, with
    opcode/attribute words NOT mistaken for buffer uses."""
    bare = _SYNTHETIC_HLO.replace("%", "")
    peak_p, _, res_p = liveness_report(_SYNTHETIC_HLO, top=10)
    peak_b, _, res_b = liveness_report(bare, top=10)
    assert peak_b == peak_p
    assert [(s, nm, sh) for s, nm, sh in res_b] == res_p


def test_liveness_rejects_unparseable_uses():
    """A format whose operand refs never match must raise, not silently
    report every buffer as dying at its own def (a massive underestimate
    that would look authoritative)."""
    # operand refs in an unrecognized numeric-id style that shares no
    # token with any defined buffer name
    weird = "\n".join(
        ["HloModule m, is_scheduled=true", "", "ENTRY main () -> f32[8] {"]
        + [f"  v{i} = f32[8]{{0}} add(#{i-1}, #{i-2})" for i in range(2, 10)]
        + ["}"]
    )
    with pytest.raises(ValueError, match="no operand uses"):
        liveness_report(weird)
