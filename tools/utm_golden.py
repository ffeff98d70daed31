from mpmath import mp, mpf, sin, cos, tan, atan, atan2, sinh, cosh, asinh, atanh, sqrt, log, pi, exp, hypot
mp.dps = 50

a = mpf(6378137); f = 1/mpf('298.257223563')
e2 = f*(2-f); e = sqrt(e2); k0 = mpf('0.9996')

# ---- Formulation 1: Krueger n-series (Karney 2011), order 6
n1 = f/(2-f)
n2,n3,n4,n5,n6 = n1**2,n1**3,n1**4,n1**5,n1**6
A_ = a/(1+n1)*(1+n2/4+n4/64+n6/256)
alpha = [n1/2-2*n2/3+5*n3/16+41*n4/180-127*n5/288+7891*n6/37800,
         13*n2/48-3*n3/5+557*n4/1440+281*n5/630-1983433*n6/1935360,
         61*n3/240-103*n4/140+15061*n5/26880+167603*n6/181440,
         49561*n4/161280-179*n5/168+6601661*n6/7257600,
         34729*n5/80640-3418889*n6/1995840,
         212378941*n6/319334400]

def krueger_fwd(lat_deg, lon_deg, lon0_deg, south=False):
    phi = mpf(lat_deg)*pi/180; lam = (mpf(lon_deg)-mpf(lon0_deg))*pi/180
    tau = tan(phi)
    sig = sinh(e*atanh(e*tau/sqrt(1+tau**2)))
    taup = tau*sqrt(1+sig**2)-sig*sqrt(1+tau**2)
    xip = atan2(taup, cos(lam))
    etap = asinh(sin(lam)/hypot(taup, cos(lam)))
    xi, eta = xip, etap
    for j in range(6):
        xi  += alpha[j]*sin(2*(j+1)*xip)*cosh(2*(j+1)*etap)
        eta += alpha[j]*cos(2*(j+1)*xip)*sinh(2*(j+1)*etap)
    E = 500000 + k0*A_*eta
    N = (10000000 if south else 0) + k0*A_*xi
    return E, N

# ---- Formulation 2: Snyder e-series (USGS Working Manual)
ep2 = e2/(1-e2)
def snyder_fwd(lat_deg, lon_deg, lon0_deg, south=False):
    phi = mpf(lat_deg)*pi/180; dlam = (mpf(lon_deg)-mpf(lon0_deg))*pi/180
    e4, e6 = e2**2, e2**3
    N = a/sqrt(1-e2*sin(phi)**2)
    T = tan(phi)**2
    C = ep2*cos(phi)**2
    Aa = dlam*cos(phi)
    M = a*((1-e2/4-3*e4/64-5*e6/256)*phi
         -(3*e2/8+3*e4/32+45*e6/1024)*sin(2*phi)
         +(15*e4/256+45*e6/1024)*sin(4*phi)
         -(35*e6/3072)*sin(6*phi))
    x = k0*N*(Aa+(1-T+C)*Aa**3/6+(5-18*T+T**2+72*C-58*ep2)*Aa**5/120)
    y = k0*(M+N*tan(phi)*(Aa**2/2+(5-T+9*C+4*C**2)*Aa**4/24
         +(61-58*T+T**2+600*C-330*ep2)*Aa**6/720))
    return x+500000, y+(10000000 if south else 0)

pts = [  # (lat, lon, zone, south)
    (48.8584, 2.2945, 31, False),     # Eiffel Tower, zone 31
    (40.5, -73.5, 18, False),         # Snyder's example point (WGS84 here)
    (-33.8568, 151.2153, 56, True),   # Sydney, zone 56 south
    (0.0, 3.0, 31, False),            # equator, central meridian
    (63.51, 9.05, 32, False),         # high latitude
    (1.29, 103.85, 48, False),        # Singapore near equator
    (37.7749, -122.4194, 10, False),  # San Francisco
]
for (lat, lon, zone, south) in pts:
    lon0 = 6*zone-183
    E1,N1_ = krueger_fwd(lat, lon, lon0, south)
    E2,N2_ = snyder_fwd(lat, lon, lon0, south)
    print(f"({lat},{lon}) z{zone}{'S' if south else 'N'}: krueger=({mp.nstr(E1,14)},{mp.nstr(N1_,14)}) snyder_diff=({mp.nstr(E1-E2,3)},{mp.nstr(N1_-N2_,3)})")
