"""File / config IO helpers.

Parity surface: utils/files.py in the reference (read_config, save_config,
pickle helpers, get_files, parse_schedule at utils/files.py:7-43). The
schedule format is identical: CSV strings, 4 fields for Tacotron
(r, lr, step, batch_size) and 3 fields for forward/vocoder (lr, step, bs).
"""
from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any, Dict, List, Tuple, Union

import yaml


def get_files(path: Union[str, Path], extension: str = '.wav') -> List[Path]:
    if isinstance(path, str):
        path = Path(path).expanduser().resolve()
    return sorted(path.rglob(f'*{extension}'))


def pickle_binary(data: object, file: Union[str, Path]) -> None:
    with open(str(file), 'wb') as f:
        pickle.dump(data, f)


def unpickle_binary(file: Union[str, Path]) -> Any:
    with open(str(file), 'rb') as f:
        return pickle.load(f)


def read_config(path: Union[str, Path]) -> Dict[str, Any]:
    with open(str(path), 'r') as stream:
        return yaml.load(stream, Loader=yaml.FullLoader)


def save_config(config: Dict[str, Any], path: Union[str, Path]) -> None:
    with open(str(path), 'w+', encoding='utf-8') as stream:
        yaml.dump(config, stream, default_flow_style=False)


def parse_schedule(schedule: List[str]) -> List[Tuple]:
    """Parse training schedule rows.

    Each row is a comma-separated string. Four fields mean
    (r, lr, max_step, batch_size); three mean (lr, max_step, batch_size).
    Underscores in numbers are allowed ('10_000').
    """
    out: List[Tuple] = []
    for line in schedule:
        parts = [p.strip() for p in str(line).split(',')]
        if len(parts) == 4:
            r, lr, step, bs = parts
            out.append((int(r), float(lr), int(step), int(bs)))
        elif len(parts) == 3:
            lr, step, bs = parts
            out.append((float(lr), int(step), int(bs)))
        else:
            raise ValueError(f'Cannot parse schedule row: {line!r}')
    return out
