DSET    ^ff1.dat
TITLE    ff1 (last)
UNDEF   -1.00000E+32  ! gap value
XDEF  285  LINEAR   27.525     0.05
YDEF  159  LINEAR   40.94     0.04
ZDEF  1  LINEAR   0     1
TDEF  11  LINEAR   02:46Z01JAN2012   17mn
VARS 1
ff1  1  99  ff1 (last)
ENDVARS
