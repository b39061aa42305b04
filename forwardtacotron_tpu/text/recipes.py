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


def multispeaker(path: Union[str, Path]
                 ) -> tuple[Dict[str, str], Dict[str, int]]:
    """Beyond-parity recipe for `id|speaker|text` metadata (VCTK-style
    exports). Returns (text_dict, speaker_dict) where speaker names are
    mapped to dense indices in sorted order — index assignment is
    deterministic so re-preprocessing keeps ids stable."""
    csv_file = get_files(path, extension='.csv')
    assert len(csv_file) == 1, f'Expected exactly one .csv in {path}'
    text_dict: Dict[str, str] = {}
    speaker_names: Dict[str, str] = {}
    with open(str(csv_file[0]), encoding='utf-8') as f:
        for line in f:
            if not line.strip():
                continue          # blank lines must not kill the run
            split = line.split('|')
            assert len(split) >= 3, \
                f'multispeaker metadata needs id|speaker|text, got: {line!r}'
            text_dict[split[0]] = split[-1]
            speaker_names[split[0]] = split[1].strip()
    index = {name: i for i, name
             in enumerate(sorted(set(speaker_names.values())))}
    speaker_dict = {item: index[name]
                    for item, name in speaker_names.items()}
    return text_dict, speaker_dict
