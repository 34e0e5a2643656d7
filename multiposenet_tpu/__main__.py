from multiposenet_tpu.cli import main

main()
