"""Dataset metadata recipes (parity: utils/text/recipes.py:6-14)."""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Union

from forwardtacotron_tpu.utils.files import get_files


def ljspeech(path: Union[str, Path]) -> Dict[str, str]:
    csv_file = get_files(path, extension='.csv')
    assert len(csv_file) == 1, f'Expected exactly one .csv in {path}'
    text_dict = {}
    with open(str(csv_file[0]), encoding='utf-8') as f:
        for line in f:
            split = line.split('|')
            text_dict[split[0]] = split[-1]
    return text_dict
