"""Evaluation math: temporal IoU, interpolated AP, confusion matrices.

Parity with reference `detect.py:179-236` (including the assert-guarded
interpolated-precision construction) and `util/eval.py:5-23`.
"""

def calc_iou(a1, a2, b1, b2):
    """Temporal IoU of [a1, a2] and [b1, b2] (`detect.py:179-182`)."""
    isect = min(a2, b2) - max(a1, b1)
    return isect / (max(a2, b2) - min(a1, b1)) if isect > 0 else 0


def compute_precision_recall_curve(is_tp, num_pos):
    recall, precision = [], []
    tp, fp = 0, 0
    for p in is_tp:
        if p:
            tp += 1
        else:
            fp += 1
        recall.append(tp / num_pos)
        precision.append(tp / (tp + fp))
    return precision, recall


def compute_interpolated_precision(precision, recall):
    interp_recall, interp_precision = [], []
    max_precision = 0
    min_recall = 1
    for i in range(1, len(recall) + 1):
        r = recall[-i]
        p = precision[-i]
        if r < min_recall:
            if len(interp_precision) == 0 or p > interp_precision[-1]:
                interp_recall.append(min_recall)
                interp_precision.append(max_precision)
        max_precision = max(max_precision, p)
        min_recall = min(min_recall, r)
    if not interp_precision:
        # Every proposal is already at full recall (e.g. a single GT
        # interval hit by the top-scored proposal). The reference crashes
        # on this input (`detect.py:225` assert); take the max precision
        # at recall 1 instead (QUIRKS.md).
        interp_recall.append(min_recall)
        interp_precision.append(max_precision)
    interp_recall.append(0)
    interp_precision.append(1)
    interp_precision.reverse()
    interp_recall.reverse()
    return interp_precision, interp_recall


def compute_ap(pc, rc):
    ipc, irc = compute_interpolated_precision(pc, rc)
    assert irc[0] == 0 and irc[-1] == 1
    area = 0
    for i in range(len(irc) - 1):
        dr = irc[i + 1] - irc[i]
        assert dr > 0
        area += ipc[i + 1] * dr
    assert 0 <= area <= 1, area
    return area


def save_confusion_matrix(truth, pred, out_file, norm=None):
    """Render a confusion-matrix PDF (`util/eval.py:5-23`)."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    from sklearn.metrics import ConfusionMatrixDisplay, confusion_matrix

    label_names = sorted(set(truth) | set(pred))
    truth_compact = [label_names.index(x) for x in truth]
    pred_compact = [label_names.index(x) for x in pred]
    cm = confusion_matrix(
        truth_compact, pred_compact, labels=list(range(len(label_names))),
        normalize=norm)
    if norm is not None:
        cm = cm * 100
    fig = plt.figure(figsize=(20, 20))
    ax = fig.add_subplot(111)
    disp = ConfusionMatrixDisplay(
        confusion_matrix=cm, display_labels=label_names)
    disp.plot(ax=ax, xticks_rotation='vertical',
              values_format='.1f' if norm is not None else 'd')
    plt.tight_layout()
    plt.savefig(out_file)
    plt.close(fig)
