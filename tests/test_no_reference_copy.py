"""No repo source file may be textually similar to any reference file.

CLAUDE.md's core rule is "study behavior, never copy code". The per-file
oracle differentials pin *behavioral* parity; this test pins *textual*
originality: a difflib line-level sweep of every vpd_tpu/native source
file against every comparably-sized reference file must stay below 0.4
similarity (the round-3 verdict's bar; the current tree passes at 0.35).

Stripped non-comment lines are compared, so formatting alone cannot hide
a transcription. Parity-locked surfaces that necessarily share text —
argparse flag declarations, dataset constants, canonical idioms — keep
small files in the 0.2-0.33 band; anything above the bar means a
copied implementation slipped in and must be re-derived from behavior.
"""

import difflib
import os
import re

import pytest

REF = '/root/reference'
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
THRESHOLD = 0.4
SKIP_DIRS = {'.git', '__pycache__', 'data', 'tests', 'build'}

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason='reference tree not available')


def _source_lines(path):
    try:
        with open(path, encoding='utf-8', errors='ignore') as fp:
            text = fp.read()
    except OSError:
        return []
    lines = [ln.strip() for ln in text.splitlines()]
    return [ln for ln in lines if ln and not ln.startswith('#')]


def _collect(root, exts=('.py', '.cpp', '.cc', '.h')):
    found = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if d not in SKIP_DIRS]
        for fn in filenames:
            if fn.endswith(exts):
                path = os.path.join(dirpath, fn)
                lines = _source_lines(path)
                if len(lines) >= 10:  # tiny files are all-idiom noise
                    found.append((path, lines))
    return found


WINDOW = 20          # stripped lines per block
WINDOW_STEP = 5
WINDOW_THRESHOLD = 0.85
# Parity-locked data surfaces that necessarily match line-for-line
# (VERDICT round-4 class (b)): argparse flag declarations and literal
# constant tables. Excluding them keeps the method-level scan about
# *logic* blocks; the whole-file test above still bounds these files.
_STRING_RE = re.compile(r"'[^']*'|\"[^\"]*\"")


def _logic_lines(lines):
    out = []
    for ln in lines:
        if 'add_argument' in ln:
            continue
        # constant-table rows: no identifier left once strings are gone
        if not re.search(r'[A-Za-z_]', _STRING_RE.sub('', ln)):
            continue
        out.append(ln)
    return out


def test_no_method_level_block_resembles_the_reference():
    """Sliding-window scan: no ~20-line logic block in any repo source
    file may be near-verbatim (difflib >= 0.85) to any same-size block
    of any reference file. This catches method-level transcriptions the
    whole-file ratio above is provably blind to (VERDICT round 4 found
    ~35 copied lines inside a 560-line file scoring 0.34 overall)."""
    ours = (_collect(os.path.join(REPO, 'vpd_tpu'))
            + _collect(os.path.join(REPO, 'native')))
    theirs = _collect(REF)
    assert ours and theirs
    # cheap pre-gate: a near-verbatim 20-line block implies the files
    # share many distinct non-trivial lines
    def distinct(lines):
        return {ln for ln in lines if len(ln) >= 8}

    offenders = []
    for our_path, our_lines in ours:
        our_lines = _logic_lines(our_lines)
        our_set = distinct(our_lines)
        for ref_path, ref_lines in theirs:
            ref_lines = _logic_lines(ref_lines)
            if len(our_set & distinct(ref_lines)) < WINDOW // 2:
                continue
            best = 0.0
            best_at = None
            for i in range(0, max(1, len(our_lines) - WINDOW + 1),
                           WINDOW_STEP):
                wa = our_lines[i:i + WINDOW]
                if len(wa) < WINDOW // 2:
                    continue
                for j in range(0, max(1, len(ref_lines) - WINDOW + 1),
                               WINDOW_STEP):
                    wb = ref_lines[j:j + WINDOW]
                    sm = difflib.SequenceMatcher(a=wa, b=wb,
                                                 autojunk=False)
                    if sm.real_quick_ratio() < WINDOW_THRESHOLD or \
                            sm.quick_ratio() < WINDOW_THRESHOLD:
                        continue
                    r = sm.ratio()
                    if r > best:
                        best, best_at = r, (i, j)
            if best >= WINDOW_THRESHOLD:
                offenders.append('{:.3f} {}:{} <> {}:{}'.format(
                    best, os.path.relpath(our_path, REPO), best_at[0],
                    os.path.relpath(ref_path, REF), best_at[1]))
    assert not offenders, (
        'near-verbatim reference blocks found (rewrite from behavior):\n'
        + '\n'.join(sorted(offenders, reverse=True)))


def test_no_file_resembles_the_reference():
    ours = (_collect(os.path.join(REPO, 'vpd_tpu'))
            + _collect(os.path.join(REPO, 'native')))
    theirs = _collect(REF)
    assert ours and theirs
    offenders = []
    for our_path, our_lines in ours:
        for ref_path, ref_lines in theirs:
            # a transcription has comparable length; skip wild mismatches
            if not 0.4 <= len(ref_lines) / len(our_lines) <= 2.5:
                continue
            sm = difflib.SequenceMatcher(
                a=our_lines, b=ref_lines, autojunk=False)
            if (sm.real_quick_ratio() < THRESHOLD
                    or sm.quick_ratio() < THRESHOLD):
                continue
            ratio = sm.ratio()
            if ratio >= THRESHOLD:
                offenders.append('{:.3f} {} <> {}'.format(
                    ratio,
                    os.path.relpath(our_path, REPO),
                    os.path.relpath(ref_path, REF)))
    assert not offenders, (
        'files too similar to the reference (rewrite from behavior, '
        'see PARITY.md):\n' + '\n'.join(sorted(offenders, reverse=True)))
