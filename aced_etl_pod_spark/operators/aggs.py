"""(stub — operators registered in a later milestone)"""
