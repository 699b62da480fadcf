from latentpose_tpu.config.argparse_utils import MyArgumentParser
from latentpose_tpu.config.core_args import build_core_parser
from latentpose_tpu.config.resolution import (get_args_and_modules,
                                              load_yaml_config)

__all__ = ["MyArgumentParser", "build_core_parser", "get_args_and_modules",
           "load_yaml_config"]
