from multiplanarunet_tpu.logging.loggers import Logger, ScreenLogger
