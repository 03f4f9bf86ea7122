"""Bar plots for dataset statistics and error analysis (headless matplotlib)."""

from typing import Any

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def bar_plot(values: dict, title: str, save_path: str, errors=None,
             y_axis_label: str = "Occurrence"):
    """Sorted-by-value bar plot (reference GroundedScan/helpers.py:69-89)."""
    sorted_values = sorted(((v, k) for k, v in values.items()),
                           key=lambda pair: (pair[0], str(pair[1])))
    values_per_label = [v for v, _ in sorted_values]
    labels = [k for _, k in sorted_values]
    if errors:
        sorted_errors = [errors[k] for _, k in sorted_values]
    else:
        sorted_errors = None
    y_pos = np.arange(len(labels))
    plt.bar(y_pos, values_per_label, yerr=sorted_errors, align="center",
            alpha=0.5)
    plt.gcf().subplots_adjust(bottom=0.2)
    plt.xticks(y_pos, [str(label) for label in labels], rotation=90,
               fontsize="xx-small")
    plt.ylabel(y_axis_label)
    plt.title(title)
    plt.savefig(save_path)
    plt.close()


def grouped_bar_plot(values: dict, group_one_key: Any, group_two_key: Any,
                     title: str, save_path: str, errors_group_one=None,
                     errors_group_two=None, y_axis_label: str = "Occurence",
                     sort_on_key: bool = True):
    """Two-group bar plot (reference GroundedScan/helpers.py:92-121)."""
    sorted_values = list(values.items())
    if sort_on_key:
        sorted_values.sort(key=lambda pair: str(pair[0]))
    values_group_one = [v[1].get(group_one_key, 0) for v in sorted_values]
    values_group_two = [v[1].get(group_two_key, 0) for v in sorted_values]
    labels = [v[0] for v in sorted_values]
    y_pos = np.arange(len(labels))
    fig, ax = plt.subplots()
    width = 0.35
    p1 = ax.bar(y_pos, values_group_one, width, align="center", alpha=0.5)
    p2 = ax.bar(y_pos + width, values_group_two, width, align="center",
                alpha=0.5)
    plt.gcf().subplots_adjust(bottom=0.2)
    plt.xticks(y_pos, [str(label) for label in labels], rotation=90,
               fontsize="xx-small")
    plt.ylabel(y_axis_label)
    plt.title(title)
    ax.legend((p1[0], p2[0]), (str(group_one_key), str(group_two_key)))
    plt.savefig(save_path)
    plt.close()
