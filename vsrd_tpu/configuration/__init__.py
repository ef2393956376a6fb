from . import configurator, registry
from .configurator import Configurator
from .registry import instantiate, register, register_defaults
