from runet_tpu.cli import main

main()
