"""Hierarchical JSON configuration.

TPU-native re-design of
`/root/reference/vsrd/configuration/configurator.py`: `load` walks parent
directories merging every ``config.json`` on the way down (root defaults,
leaf overrides), `gather`/`scatter` factor shared keys up/down a config
tree. One deliberate change: on scalar conflicts the *deeper* config wins
(the reference asserts equality, configurator.py:146-148), which makes
per-drive overrides usable.
"""

from __future__ import annotations

import functools
import glob
import json
import os


class Configurator:
    @staticmethod
    def load(filename: str) -> dict:
        assert os.path.exists(filename), filename

        def load_chain(filename):
            if not os.path.exists(filename):
                return []
            parent = os.path.dirname(os.path.dirname(filename))
            configs = load_chain(os.path.join(parent, "config.json"))
            with open(filename) as file:
                configs.append(json.load(file))
            return configs

        return Configurator.merge(*load_chain(filename))

    @staticmethod
    def merge(*configs) -> dict:
        """Deep-merge; later (deeper) configs override earlier ones."""

        def merge_two(base, override):
            if not (isinstance(base, dict) and isinstance(override, dict)):
                return override
            merged = dict(base)
            for key, value in override.items():
                merged[key] = (
                    merge_two(base[key], value) if key in base else value
                )
            return merged

        return functools.reduce(merge_two, configs, {})

    @staticmethod
    def gather(root: str, verbose: bool = False) -> None:
        """Factor keys shared by all sibling configs into the parent
        (reference configurator.py:9-60)."""

        def common_subtree(configs):
            if not configs:
                return {}
            if not all(isinstance(c, dict) for c in configs):
                first = configs[0]
                if all(c == first for c in configs[1:]):
                    return first
                return None
            keys = set.intersection(*[set(c.keys()) for c in configs])
            shared = {}
            for key in keys:
                sub = common_subtree([c[key] for c in configs])
                if sub is not None and sub != {}:
                    shared[key] = sub
            return shared

        def subtract(config, shared):
            if not isinstance(config, dict) or not isinstance(shared, dict):
                return None if config == shared else config
            result = {}
            for key, value in config.items():
                if key in shared:
                    remainder = subtract(value, shared[key])
                    if remainder is not None and remainder != {}:
                        result[key] = remainder
                else:
                    result[key] = value
            return result

        def gather_impl(dirname):
            child_dirs = sorted(
                d for d in glob.glob(os.path.join(dirname, "*")) if os.path.isdir(d)
            )
            for child in child_dirs:
                gather_impl(child)

            filenames = [
                os.path.join(d, "config.json")
                for d in child_dirs
                if os.path.exists(os.path.join(d, "config.json"))
            ]
            if len(filenames) < 2:
                return
            configs = []
            for filename in filenames:
                with open(filename) as file:
                    configs.append(json.load(file))
            shared = common_subtree(configs)
            if not shared:
                return
            parent_file = os.path.join(dirname, "config.json")
            parent = {}
            if os.path.exists(parent_file):
                with open(parent_file) as file:
                    parent = json.load(file)
            with open(parent_file, "w") as file:
                json.dump(Configurator.merge(parent, shared), file, indent=4,
                          sort_keys=True)
            for filename, config in zip(filenames, configs):
                with open(filename, "w") as file:
                    json.dump(subtract(config, shared) or {}, file, indent=4,
                              sort_keys=True)
            if verbose:
                print(f"Gathered shared keys into {parent_file}")

        gather_impl(root)

    @staticmethod
    def scatter(root: str, verbose: bool = False) -> None:
        """Push parent defaults down into child configs and remove the
        parent file (reference configurator.py:63-114)."""

        def scatter_impl(dirname):
            parent_file = os.path.join(dirname, "config.json")
            child_dirs = sorted(
                d for d in glob.glob(os.path.join(dirname, "*")) if os.path.isdir(d)
            )
            child_files = [
                os.path.join(d, "config.json")
                for d in child_dirs
                if os.path.exists(os.path.join(d, "config.json"))
            ]
            if os.path.exists(parent_file) and child_files:
                with open(parent_file) as file:
                    default = json.load(file)
                for filename in child_files:
                    with open(filename) as file:
                        config = json.load(file)
                    with open(filename, "w") as file:
                        json.dump(Configurator.merge(default, config), file,
                                  indent=4, sort_keys=True)
                os.remove(parent_file)
                if verbose:
                    print(f"Scattered {parent_file} into children")
            for child in child_dirs:
                scatter_impl(child)

        scatter_impl(root)
